"""End-to-end corpus curation demo: fixture documents → curated,
dataloader-ready packed chunks, with a per-stage drop audit.

    python examples/curate.py [sf_dir]      (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from eth_event_tracker_spark.curation import curate
from eth_event_tracker_spark.session import get_spark
from eth_event_tracker_spark.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curate-demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.where(F.col("doc_id") % 10 == 7).select("doc_id", "text")

    res = curate(
        docs,
        eval_df,
        lm_logprob_min=-8.0,  # drop rare-token soup (unigram-LM score)
        mix_rates={"en": 0.5, "de": 0.35, "es": 0.3, "fr": 0.3},
        mix_default_rate=0.1,
        source_cap=20,  # bound any one source's share of the corpus
        split_weights={"train": 0.9, "val": 0.05, "test": 0.05},
    )
    print("stages:", " → ".join(res.stages))
    for k, v in sorted(res.audit().items()):
        print(f"  {k}: {v}")
    print("near-dup pairs:", res.dup_pairs.count())
    print("split sizes:")
    res.kept.groupBy("split").count().orderBy("split").show()
    print("packed sequences:",
          res.packed.select("shard", "seq_id").distinct().count())
    res.packed.orderBy("shard", "seq_id", "doc_id", "chunk_id").show(8, truncate=40)

    # training-order layout: one ordered parquet file per shard
    import tempfile

    from eth_event_tracker_spark.operators.export import export_shards, validate_shards
    from eth_event_tracker_spark.operators.splits import write_training_shards

    with tempfile.TemporaryDirectory() as tmp:
        write_training_shards(
            res.kept.where("split = 'train'").select("doc_id", "text"), f"{tmp}/shards", 4
        )
        n_files = len(list(Path(tmp).glob("shards/shard=*/*.parquet")))
        print(f"training shards written: {n_files} ordered files")

        # packed-sequence sink: manifest-validated corpus export
        manifest = export_shards(res.packed, f"{tmp}/corpus")
        report = validate_shards(spark, f"{tmp}/corpus")
        print(
            f"exported corpus: {manifest['total_rows']} chunks, "
            f"{manifest['total_words']} words across {manifest['n_shards']} "
            f"shards; validation ok={report['ok']}"
        )


if __name__ == "__main__":
    main()
