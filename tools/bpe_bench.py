"""BPE production-vocab training bench (r3 VERDICT Next #8).

Trains on the sf0.1 documents corpus, sweeps batch_size, and reports
wall, Spark rounds (driver round trips), merges/sec, and the
extrapolated 32k-merge wall. The training loop's cost model is
rounds x (pair-count aggregation over the unique-word table + a
driver collect of the top pairs); the word table is corpus-vocabulary
sized (~100k rows at any corpus scale), so per-round cost is flat in
corpus size and the 32k extrapolation is linear in rounds.

Usage: python tools/bpe_bench.py [num_merges] [sf_dir]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from chronon_spark.operators import tokenizer
from chronon_spark.session import build_session


def main():
    num_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = build_session(
        master="local[32]",
        extra_conf={"spark.ui.enabled": "false",
                    "spark.sql.shuffle.partitions": "32"},
    )
    if sf_dir == "synthetic":
        # deterministic high-entropy corpus: the sf documents tables are
        # template-generated and exhaust their pair vocabulary at ~90
        # merges; production tokenizer training needs a vocabulary that
        # sustains tens of thousands. 60k distinct words (base-26 digit
        # strings of md5-derived ints, zipf-ish counts) as 5k docs.
        from pyspark.sql import functions as F

        words = spark.range(60_000).select(
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 10), 16, 26)
            .alias("w")
        )
        # each word appears twice (min_count=2 survivable); ~12 words/doc
        docs = (
            words.withColumn("doc", F.abs(F.hash("w")) % 5000)
            .groupBy("doc")
            .agg(F.concat_ws(" ", F.collect_list(
                F.concat(F.col("w"), F.lit(" "), F.col("w")))).alias("text"))
            .cache()
        )
    else:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    out = {"sf_dir": sf_dir, "docs": n_docs, "num_merges": num_merges,
           "sweep": []}
    for batch in (1, 8, 32, 128):
        # batch=1 is the bit-exact sequential reference mode; bound its
        # merge count (per-round cost is flat, extrapolation is linear)
        n = min(num_merges, 128) if batch == 1 else num_merges
        t0 = time.time()
        merges = tokenizer.bpe_train(
            docs, num_merges=n, min_count=2, batch_size=batch
        )
        wall = time.time() - t0
        got = len(merges)
        # rounds = ceil(merges / batch) in the non-degenerate case
        rounds = (got + batch - 1) // batch
        rec = {
            "batch_size": batch,
            "merges": got,
            "wall_sec": round(wall, 1),
            "rounds": rounds,
            "sec_per_round": round(wall / max(rounds, 1), 2),
            "merges_per_sec": round(got / wall, 2),
            "extrapolated_32k_wall_min": round(
                (32_768 / max(got, 1)) * wall / 60, 1
            ),
        }
        out["sweep"].append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
