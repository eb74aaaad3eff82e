"""Scaling-efficiency evidence for the north rule: the same flag-mode
validation job on the SAME deterministic input at local[N] and local[4N],
each in its own JVM (a fresh subprocess per parallelism level — Spark
can't change master in-process).

Efficiency = throughput(4N) / (4 * throughput(N)); target ≥ 0.8.
The job is one scan with zero shuffle, so the only obstacles to linear
scaling are scheduler overhead and memory bandwidth — which is exactly
what a 1000-executor cluster would see per node.

Writes BENCH_SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

WORKER = r"""
import sys, time
sys.path.insert(0, {repo!r})
from jsonschema_rs_spark import compile_schema
from jsonschema_rs_spark.docspec import DOC_SPEC_FULL, default_options
from jsonschema_rs_spark.session import get_spark
import bench

cores, n_docs = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark(app_name=f"scale{{cores}}", cores=cores,
                  shuffle_partitions=2 * cores,
                  extra_conf={{"spark.sql.files.maxPartitionBytes":
                               str(4 * 1024 * 1024)}})
path = bench.materialize_docs(spark, n_docs)
def job(p):
    docs = spark.read.parquet(p)
    plan = compile_schema(DOC_SPEC_FULL, docs.schema, default_options())
    v = plan.with_validation(docs, mode="flag")
    t0 = time.perf_counter()
    v.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0
job(path)             # JIT/codegen + page-cache warmup
best = min(job(path) for _ in range(2))
print("ELAPSED", best)
"""


def _run(cores: int, n_docs: int) -> float:
    code = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(n_docs)],
        capture_output=True, text=True, timeout=900)
    for line in out.stdout.splitlines():
        if line.startswith("ELAPSED"):
            return float(line.split()[1])
    raise RuntimeError(f"worker failed (cores={cores}):\n{out.stderr[-2000:]}")


def measure(n_docs: int = 2_000_000, n: int = 8) -> dict:
    t_n = _run(n, n_docs)
    t_4n = _run(4 * n, n_docs)
    thr_n = n_docs / t_n
    thr_4n = n_docs / t_4n
    eff = thr_4n / (4 * thr_n)
    return {
        "n_docs": n_docs,
        "cores_n": n,
        "cores_4n": 4 * n,
        "sec_n": round(t_n, 3),
        "sec_4n": round(t_4n, 3),
        "docs_per_sec_n": round(thr_n),
        "docs_per_sec_4n": round(thr_4n),
        "efficiency": round(eff, 3),
    }


def main() -> None:
    # 4x the suite-bench size: at 2M the 4N-core job finishes in under 2s
    # and task-scheduling overhead dominates the efficiency ratio
    n_docs = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "8000000"))
    r = measure(n_docs)
    md = f"""# BENCH_SCALING — throughput scaling N → 4N (north rule)

Same job (flag-mode validation of the deterministic interleaved
documents table, {r['n_docs']:,} rows, identical at any parallelism),
fresh JVM per level, best of 2 runs after warmup.

| parallelism | wall (s) | docs/sec |
| --- | --- | --- |
| local[{r['cores_n']}]  | {r['sec_n']} | {r['docs_per_sec_n']:,} |
| local[{r['cores_4n']}] | {r['sec_4n']} | {r['docs_per_sec_4n']:,} |

**Scaling efficiency** = throughput(4N) / (4 × throughput(N)) =
**{r['efficiency']}** (target ≥ 0.8).

The validation plan is a single whole-stage-codegen Project over the
scan — no Exchange — so per-row work is constant and the job partitions
perfectly; the same property holds on a multi-executor cluster where
`spark-submit --py-files` distributes this package.
"""
    with open(os.path.join(REPO, "BENCH_SCALING.md"), "w") as f:
        f.write(md)
    print(json.dumps(r))


if __name__ == "__main__":
    main()
