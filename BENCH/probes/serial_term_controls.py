#!/usr/bin/env python
"""Which part of the sketch stage refuses to scale on this host?

Control A — pure JVM whole-stage codegen: tokenize + xxhash64 per token +
sum(size) — no Python, no Arrow, no shuffle.
Control B — minimal Arrow round-trip: the same token-hash arrays cross
into a trivial pandas UDF (sum per row) and back — isolates Arrow IPC +
Python-worker buffer traffic from kernel math.

Usage: python BENCH/probes/serial_term_controls.py <corpus_parquet> <cores> <a|b>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402
from pyspark.sql.types import LongType  # noqa: E402

from duplicatesuricate_spark import get_spark  # noqa: E402
from duplicatesuricate_spark.config import DEFAULT_CONFIG as cfg  # noqa: E402
from duplicatesuricate_spark.functions.text import tokens_expr  # noqa: E402
from duplicatesuricate_spark.functions.util import ensure_min_partitions  # noqa: E402


@pandas_udf(LongType())
def arrow_rowsum(th: pd.Series) -> pd.Series:
    import numpy as np

    return th.map(lambda a: int(np.asarray(a, dtype=np.int64).sum()))


def main() -> None:
    corpus_path, cores, which = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    spark = get_spark(app_name=f"ctl-{which}-{cores}", cores=cores,
                      shuffle_partitions=cores * 2)
    df = ensure_min_partitions(spark.read.parquet(corpus_path))
    n = df.count()  # warmup

    th = F.transform(tokens_expr("content", cfg), lambda t: F.xxhash64(t))
    t0 = time.monotonic()
    if which == "a":
        out = df.select(th.alias("th")).agg(
            F.sum(F.size("th")), F.bit_xor(F.element_at("th", 1))
        ).collect()[0]
    else:
        out = df.select(arrow_rowsum(th).alias("s")).agg(F.bit_xor("s")).collect()[0]
    wall = time.monotonic() - t0
    print(json.dumps({
        "control": which, "cores": cores, "n_docs": n,
        "wall_sec": round(wall, 2), "docs_per_sec": round(n / wall, 2),
        "check": [int(x) for x in out],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
