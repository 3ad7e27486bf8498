"""Scale-stress the distributed Gram matrix kernel.

Usage: python tools/stress_gram.py [n_rows] [dim]   (default 500k, 64)

Builds a synthetic embedding table (deterministic per-row values — no
RNG state) and, at n and n/4 rows:

- times the q_embed_gram kernel shape at each scale (compare the two
  cold timings to judge linearity — shuffle reuse makes a same-size
  second run trivially fast, so same-size repeats are NOT comparable);
- asserts the post-kernel output is exactly d(d+1)/2 cells at BOTH
  scales (the shuffle is row-count-independent);
- value-checks the DECIMAL(38,0) reduction against an int64 numpy
  reference on the same fixed-point data (min(20k, n) rows), so the
  overflow-safe path is checked by value, not just by type.
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

    for n_run in (n // 4, n):
        run = base.limit(n_run).select(
            F.col("id"),
            F.expr(f"transform(sequence(1, {d}), "
                   "i -> CAST(sin(CAST(id AS DOUBLE) * i) * 0.3 AS "
                   "FLOAT))").alias("embedding"))
        plan = (run.select("embedding").mapInArrow(gram, out_schema)
                .groupBy("i", "j")
                .agg(F.sum(F.col("partial").cast("decimal(38,0)"))
                     .alias("g_u")))
        t0 = time.time()
        rows = plan.collect()
        dt = time.time() - t0
        assert len(rows) == d * (d + 1) // 2, len(rows)
        print(f"gram n={n_run} d={d}: {dt:.2f}s cells={len(rows)}")

    # value check on a small slice vs numpy (same fixed-point math)
    small = min(20_000, n)
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
