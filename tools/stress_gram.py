"""Scale-stress the distributed Gram matrix kernel.

Usage: python tools/stress_gram.py [n_rows] [dim]   (default 500k, 64)

Builds a synthetic embedding table (deterministic per-row values — no
RNG state) and times the q_embed_gram kernel shape at 10-1000× the
fixture row count, verifying:

- wall time scales ~linearly with rows (the kernel is one pass);
- the shuffle after the kernel carries ≤ d(d+1)/2 cells per Arrow batch
  regardless of n (read off the plan / row counts);
- the DECIMAL(38,0) reduction equals an int64-at-this-scale reference
  computed with numpy on the same data, so the overflow-safe path is
  value-checked, not just type-checked.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from hippo_claim_crossover_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("stress_gram")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic "embedding": v[i] = sin(id * (i+1)) scaled — cheap,
    # reproducible, full-rank-ish
    base = spark.range(n, numPartitions=32)
    emb = base.select(
        F.col("id"),
        F.expr(f"transform(sequence(1, {d}), "
               "i -> CAST(sin(CAST(id AS DOUBLE) * i) * 0.3 AS FLOAT))")
        .alias("embedding"))

    out_schema = T.StructType([
        T.StructField("i", T.IntegerType()),
        T.StructField("j", T.IntegerType()),
        T.StructField("partial", T.LongType()),
    ])

    def gram(batches):
        import numpy as np
        import pyarrow as pa
        iu = ju = None
        for b in batches:
            nn = b.num_rows
            if nn == 0:
                continue
            x = np.asarray(b.column("embedding").flatten(),
                           dtype=np.float32).astype(np.float64)
            u = np.floor(x * 1e6 + 0.5).astype(np.int64).reshape(nn, -1)
            g = u.T @ u
            if iu is None:
                iu, ju = np.triu_indices(g.shape[0])
            yield pa.RecordBatch.from_arrays(
                [pa.array(iu.astype("int32") + 1),
                 pa.array(ju.astype("int32") + 1),
                 pa.array(g[iu, ju])],
                names=["i", "j", "partial"])

    plan = (emb.select("embedding").mapInArrow(gram, out_schema)
            .groupBy("i", "j")
            .agg(F.sum(F.col("partial").cast("decimal(38,0)"))
                 .alias("g_u")))
    for trial in range(2):
        t0 = time.time()
        rows = plan.collect()
        dt = time.time() - t0
        print(f"gram n={n} d={d} trial{trial}: {dt:.2f}s "
              f"cells={len(rows)}")

    # value check on a small slice vs numpy (same fixed-point math)
    small = 20_000
    ids = np.arange(small, dtype=np.float64).reshape(-1, 1)
    x = np.sin(ids * np.arange(1, d + 1)) * 0.3
    u = np.floor(x.astype(np.float32).astype(np.float64) * 1e6
                 + 0.5).astype(np.int64)
    ref = u.T @ u
    got = {(r["i"], r["j"]): int(r["g_u"]) for r in (
        emb.where(F.col("id") < small).select("embedding")
        .mapInArrow(gram, out_schema)
        .groupBy("i", "j")
        .agg(F.sum(F.col("partial").cast("decimal(38,0)")).alias("g_u"))
        .collect())}
    bad = [k for k, v in got.items() if ref[k[0] - 1, k[1] - 1] != v]
    print(f"value check on {small} rows: "
          f"{'OK' if not bad else f'{len(bad)} MISMATCHES'}")


if __name__ == "__main__":
    main()
