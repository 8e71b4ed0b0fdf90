"""Streaming alignment must equal the batch alignment on the same files
when drained with availableNow (stateless narrow plan -> exact row parity)."""

import pandas as pd
import pytest

from nmalign_spark.functions.normalize import DEFAULT_NORMALIZATION
from nmalign_spark.operators.align import align_pages
from nmalign_spark.sources.pages import pages_from_documents
from nmalign_spark.streaming.extract import stream_align_pages

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages_stream")
    # two files so more than one micro-batch is possible
    from pyspark.sql import SparkSession
    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    pages_from_documents(spark, SF).limit(60).repartition(2) \
        .write.mode("overwrite").parquet(str(d))
    return str(d)


def _canon(pdf: pd.DataFrame) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return (pdf.sort_values(by=["url", "i"]).reset_index(drop=True)
            .to_csv(index=False))


def test_stream_align_equals_batch(spark, pages_dir, tmp_path):
    sdf = stream_align_pages(spark, pages_dir,
                             normalization=DEFAULT_NORMALIZATION,
                             max_files_per_trigger=1)
    assert sdf.isStreaming
    q = (sdf.writeStream.format("memory").queryName("align_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_align"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM align_stream").toPandas()
    want = align_pages(spark.read.parquet(pages_dir),
                       normalization=DEFAULT_NORMALIZATION).toPandas()
    assert _canon(got) == _canon(want)


def test_stream_quality_gate_equals_batch(spark, tmp_path):
    """The streaming at-ingest Gopher gate must keep exactly the id set
    the batch filter keeps (same shared expressions), drained with
    availableNow across multiple micro-batches."""
    from pyspark.sql import functions as F
    from nmalign_spark.operators.textstats import gopher_metrics
    from nmalign_spark.streaming.extract import stream_quality_gate

    src = tmp_path / "docs_stream"
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.repartition(3).write.mode("overwrite").parquet(str(src))

    sdf = stream_quality_gate(spark, str(src), max_files_per_trigger=1)
    assert sdf.isStreaming
    q = (sdf.writeStream.format("memory").queryName("gate_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_gate"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {r.doc_id for r in spark.sql(
        "SELECT doc_id FROM gate_stream").collect()}
    want = {r.doc_id for r in
            spark.read.parquet(str(src))
            .where(gopher_metrics()["pass_gopher"])
            .select("doc_id").collect()}
    assert got == want and 0 < len(want) < docs.count()


def test_stream_quality_gate_exactly_once_across_restarts(spark, tmp_path):
    """Checkpointed restart: drain once, land new files, restart from the
    same checkpoint — the second drain processes ONLY the new files (no
    reprocessing, no loss), and the union equals the batch filter over
    everything.  This is the streaming face of the pipeline's resume
    guarantee (plans/pipeline.py anti-join)."""
    from pyspark.sql import functions as F
    from nmalign_spark.operators.textstats import gopher_metrics
    from nmalign_spark.streaming.extract import stream_quality_gate

    src = tmp_path / "docs_inc"
    out = str(tmp_path / "gate_out")
    ckpt = str(tmp_path / "ckpt_inc")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.where(F.col("doc_id") % 2 == 0).repartition(2) \
        .write.mode("overwrite").parquet(str(src))

    def drain():
        # parquet sink: the real exactly-once path (memory sink cannot
        # recover from a checkpoint)
        q = (stream_quality_gate(spark, str(src))
             .writeStream.format("parquet").option("path", out)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        rows = spark.read.parquet(out).collect()
        ids = [r.doc_id for r in rows]
        assert len(ids) == len(set(ids))   # exactly-once: no dup rows
        return set(ids)

    first = drain()
    docs.where(F.col("doc_id") % 2 == 1).repartition(2) \
        .write.mode("append").parquet(str(src))
    both = drain()

    want = {r.doc_id for r in
            docs.where(gopher_metrics()["pass_gopher"])
            .select("doc_id").collect()}
    assert first and first < both      # second drain added only new files
    assert both == want                # nothing lost, nothing reprocessed


def test_stream_boilerplate_gate_equals_batch(spark, tmp_path):
    """The streaming at-ingest boilerplate strip (committed blocklist of
    line hashes) must produce exactly the batch twin's per-doc
    (n_lines, n_kept, clean_md5) rows — same shared HOF expression."""
    import hashlib

    from nmalign_spark.operators import dedup as dd
    from nmalign_spark.streaming.extract import stream_boilerplate_gate

    src = tmp_path / "docs_bp"
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    clut = dd._cluttered_docs(spark, SF)
    docs.drop("text").join(clut, "doc_id") \
        .repartition(3).write.mode("overwrite").parquet(str(src))

    bl = [hashlib.md5(dd.LINE_BANNER.encode()).hexdigest(),
          hashlib.md5(dd.LINE_FOOTER.encode()).hexdigest()]
    sdf = stream_boilerplate_gate(spark, str(src), bl,
                                  max_files_per_trigger=1)
    assert sdf.isStreaming
    q = (sdf.writeStream.format("memory").queryName("bp_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_bp"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.sql("SELECT * FROM bp_stream").collect()}
    want = {tuple(r) for r in dd.boilerplate_gate_counts(spark, SF).collect()}
    assert got == want
    # the gate actually stripped something: banner/footer docs lost lines
    assert any(r[1] > r[2] for r in got)
