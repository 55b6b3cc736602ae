"""Corpus front-door sources (WARC et al.) feeding the pages input table."""
