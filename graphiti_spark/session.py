"""SparkSession factory with scale-oriented defaults.

Defaults chosen for a large cluster reading ~100 TB:
 - AQE on (runtime coalescing + skew-join splitting),
 - Arrow-batched Python UDFs,
 - shuffle partitions sized by env (32 in the local sandbox; thousands on a
   real cluster — set SPARK_GRAFT_SHUFFLE_PARTITIONS).

The sandbox has no Iceberg runtime jar; on a production cluster add the
iceberg-spark-runtime jar and a catalog config, and ``sinks.tables`` switches
to ``MERGE INTO`` / snapshot commits automatically (see sinks/tables.py).
"""

from __future__ import annotations

import os
import re
import tempfile
import zipfile

from pyspark.sql import SparkSession


def plan_width(spark: SparkSession) -> int:
    """Partition width for explicit repartitions in the plan.

    On a real cluster this is a property of the DATA (bytes / target
    partition size), not of the cluster: you do not change shuffle widths
    when growing from N to 4N executors — you add task slots that drain the
    same task queue faster. ``SPARK_GRAFT_PLAN_WIDTH`` pins it (the scaling
    bench sets one width for both cluster sizes so the two legs execute the
    IDENTICAL plan and the wall ratio measures scheduling, not per-task
    fixed overhead × a level-dependent task count). Default: 1 wave per
    core of the current session — explicit repartitions here feed uniform
    hash-partitioned python-UDF stages, where extra waves only multiply
    per-task fixed overhead (see get_spark's measured width A/B).
    """
    w = os.environ.get("SPARK_GRAFT_PLAN_WIDTH")
    if w:
        return int(w)
    return spark.sparkContext.defaultParallelism


def widen_if_narrow(df, key: str):
    """Width guard for operators fed directly from a small scan: a corpus
    below ``files.maxPartitionBytes`` arrives as ONE split and would run the
    whole operator on one core at any parallelism level (the
    plans.pipeline.ensure_scan_width lesson, generalized). Hash-repartition
    on ``key`` to plan_width when the input is narrower than the session's
    parallelism; a warehouse-scale scan already has >> cores splits and this
    is a no-op."""
    spark = df.sparkSession
    if df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        return df.repartition(plan_width(spark), key)
    return df


def session_pandas_udf(returnType):
    """`F.pandas_udf` for MODULE-LEVEL UDFs, re-bound per SparkContext.

    pyspark's UserDefinedFunction caches its JVM UserDefinedPythonFunction
    forever (`_judf_placeholder`), and that object embeds the CREATING
    context's PythonAccumulatorV2 — including the host:port of that
    context's Python accumulator server. A module-level `@F.pandas_udf`
    therefore goes stale when the application stops one SparkSession and
    starts another (a bench or notebook pattern): every Python task run
    under the new session ships its accumulator update to the DEAD server,
    and the DAGScheduler logs `Failed to update accumulator 0 ...
    Broken pipe` per task (the BENCH_r03 artifact pollution; profiling
    accumulators are silently lost too).

    This decorator keeps one compiled UDF per live SparkContext (keyed by
    context identity, stale entries dropped), so the plan-side cost is
    identical within a session and a session restart transparently rebinds.
    """
    import functools

    from pyspark.sql import functions as F

    def deco(fn):
        cache: dict[int, object] = {}

        @functools.wraps(fn)
        def call(*cols):
            from pyspark.core.context import SparkContext

            sc = SparkContext._active_spark_context
            key = id(sc)
            udf = cache.get(key)
            if udf is None:
                cache.clear()  # at most one live context per process
                udf = F.pandas_udf(returnType)(fn)
                cache[key] = udf
            return udf(*cols)

        return call

    return deco


def _ship_package(spark: SparkSession) -> None:
    """Ship graphiti_spark to executor Python workers (the in-session twin of
    ``spark-submit --py-files graphiti_spark.zip``). Without it, pandas UDFs
    defined in this package fail to unpickle on workers whose PYTHONPATH
    doesn't include the repo."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(tempfile.gettempdir(), f"graphiti_spark_pyfiles_{os.getpid()}.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:  # rebuilt per process: never stale
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.join("graphiti_spark", os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)


def get_spark(
    app_name: str = "graphiti_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    if shuffle_partitions is None:
        env_sp = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        if env_sp is not None:
            shuffle_partitions = int(env_sp)
        else:
            # 1 wave per core. Waves only pay when per-task durations are
            # skewed; this engine's python-UDF stages sit behind HASH
            # repartitions (uniform tasks), so extra waves just multiply the
            # per-task fixed overhead (python worker batch setup, UDF memo
            # cold start). Measured paired A/B at local[32] sf0.1: width 96
            # (3 waves) ran the pipeline ~2x slower than width 32 in BOTH
            # trials (74.4 vs 150.0 s, 52.1 vs 114.2 s). On a real cluster
            # width is a DATA property — set SPARK_GRAFT_SHUFFLE_PARTITIONS
            # to bytes/target-partition-size (thousands).
            m = re.fullmatch(r"local\[(\d+|\*)\]", master or "")
            cores = os.cpu_count() or 8
            if m and m.group(1) != "*":
                cores = int(m.group(1))
            shuffle_partitions = cores

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesces post-shuffle partitions by BYTES (default min 1MB),
        # but this engine's post-shuffle stages are often python-UDF-heavy on
        # byte-small tables (entity catalog -> embedding UDF, merged edges ->
        # fact-embedding UDF): at the default, a 3MB catalog collapses to 1-3
        # partitions and the UDF runs on 1-3 cores at ANY cluster size —
        # measured as flat, non-scaling stage walls at local[2] vs local[8].
        # 64k keeps such stages wide; truly tiny shuffles still coalesce.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # RPC robustness under CPU starvation: when the whole JVM is pinned
        # to few cores (tools/scaling_bench.py --pin) or the host is
        # saturated, netty/heartbeat threads can starve past the default
        # 120s network timeout and the driver endpoint "disappears",
        # shutting the context down mid-job (observed at local[2] pinned to
        # 2 cores). Generous timeouts cost nothing when healthy.
        .config("spark.network.timeout", "600s")
        .config("spark.executor.heartbeatInterval", "60s")
        .config("spark.rpc.askTimeout", "600s")
        .config("spark.rpc.lookupTimeout", "600s")
    )
    # JVM tuning (override with SPARK_GRAFT_JAVA_OPTS). This is a batch
    # engine: GC pause times are irrelevant, GC CPU is not — default G1's
    # concurrent marking measured MORE CPU than the entire job's compute at
    # high thread counts (local[16], sf0.1 x12 corpus: G1 4333 cpu-s / 340 s
    # wall vs ParallelGC 1848 cpu-s / 194 s wall, identical output). Also pin
    # the GC worker pool to the parallelism level: JVM ergonomics size it
    # from the HOST core count, wrong for local[N] on a shared box (on a
    # real cluster each executor JVM gets spark.executor.cores, where the
    # same reasoning applies).
    java_opts = os.environ.get("SPARK_GRAFT_JAVA_OPTS")
    if java_opts is None:
        m = re.fullmatch(r"local\[(\d+)\]", master or "")
        mc = re.fullmatch(r"local-cluster\[(\d+),(\d+),\d+\]", master or "")
        if m:
            gc_threads = int(m.group(1))
        elif mc:
            gc_threads = int(mc.group(2))  # per-executor cores
        else:
            gc_threads = os.cpu_count() or 8
        java_opts = f"-XX:+UseParallelGC -XX:ParallelGCThreads={max(gc_threads, 2)}"
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
        # local-cluster / real clusters: executor JVMs take their own flag.
        builder = builder.config("spark.executor.extraJavaOptions", java_opts)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark
