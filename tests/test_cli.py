"""The `python -m cloudbrush_spark` CLI: the reference driver's three
entry points (full assembly / -run_stats / -convert_fa) over a small
genome-sliced read set, end to end through the real Assembler."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloudbrush_spark.__main__ import main  # noqa: E402


def _write_reads(path: str) -> str:
    # 40 reads of length 20 tiling a 120 bp deterministic "genome" with
    # heavy overlap — assembles into few contigs at k=9
    import hashlib
    g = "".join("ACGT"[b % 4] for b in hashlib.sha256(b"cli-genome").digest() * 4)[:120]
    with open(path, "w") as fh:
        for i in range(40):
            lo = (i * 3) % (len(g) - 20)
            fh.write(f"r{i:03d}\t{g[lo:lo + 20]}\n")
    return path


def test_cli_assemble_stats_convert(tmp_path, spark, capsys):
    sfa = _write_reads(str(tmp_path / "reads.sfa"))
    out = str(tmp_path / "asm")

    rc = main(["-reads", sfa, "-asm", out, "-k", "9", "-readlen", "20"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "nodes.parquet"))
    assert os.path.exists(os.path.join(out, "edges.parquet"))
    fasta_dir = os.path.join(out, "contigs.fa")
    parts = [f for f in os.listdir(fasta_dir) if f.startswith("part-")]
    text = "".join(open(os.path.join(fasta_dir, p)).read() for p in parts)
    assert text.startswith(">") and "len=" in text
    captured = capsys.readouterr().out
    assert "counters:" in captured and "size distribution" in captured

    rc = main(["-run_stats", out, "-genome", "120"])
    assert rc == 0
    assert "genome-target N50" in capsys.readouterr().out

    rc = main(["-convert_fa", out])
    assert rc == 0

    # missing required args -> help + exit 2, not a traceback
    assert main([]) == 2


def test_cli_curate_publishes_corpus(tmp_path, spark, capsys):
    from pyspark.sql import functions as F
    base = ("the quick brown fox jumps over the lazy dog and runs to the "
            "river every morning for a drink of cold clear water ")
    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(base), F.lit("variant word "), F.col("id")).alias("text"))
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "published")

    rc = main(["-curate", src, "-out", out, "-files_per_split", "1"])
    assert rc == 0
    assert "published:" in capsys.readouterr().out
    manifest = spark.read.parquet(os.path.join(out, "manifest.parquet"))
    corpus = spark.read.parquet(os.path.join(out, "corpus"))
    assert manifest.count() == corpus.count() > 0
    # published rows carry the original text and a valid split
    row = corpus.limit(1).collect()[0]
    assert row.text.startswith(base) and row.split in ("train", "val", "test")

    # -curate without -out is a usage error, not a traceback
    import pytest
    with pytest.raises(SystemExit):
        main(["-curate", src])


def test_cli_curate_with_benchmark_decontaminates(tmp_path, spark, capsys):
    from pyspark.sql import functions as F
    base = ("the quick brown fox jumps over the lazy dog and runs to the "
            "river every morning for a drink of cold clear water ")
    other = ("a completely different tale about the sea and the ships that "
             "sail in it for trade and glory with cargo of spice and silk "
             "carried to the southern ports by the wind ")
    docs = spark.createDataFrame(
        [(0, base + "zero"), (1, base + "one"), (2, other + "two")],
        "doc_id long, text string")
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    bench = spark.createDataFrame([(100, base)], "doc_id long, text string")
    bpath = str(tmp_path / "bench.parquet")
    bench.write.parquet(bpath)
    out = str(tmp_path / "published")

    rc = main(["-curate", src, "-out", out, "-files_per_split", "1",
               "-benchmark", bpath, "-decontam_n", "8"])
    assert rc == 0
    manifest = spark.read.parquet(os.path.join(out, "manifest.parquet"))
    kept = {r.doc_id for r in manifest.collect()}
    assert kept == {2}  # the two benchmark-overlapping docs are dropped


def test_cli_curate_with_semantic_decontamination(tmp_path, spark, capsys):
    from pyspark.sql import functions as F
    base = ("the quick brown fox jumps over the lazy dog and runs to the "
            "river every morning for a drink of cold clear water ")
    other = ("a completely different tale about the sea and the ships that "
             "sail in it for trade and glory with cargo of spice and silk "
             "carried to the southern ports by the wind ")
    docs = spark.createDataFrame(
        [(0, base + "zero"), (1, other + "one")], "doc_id long, text string")
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    # doc 0's embedding rides the benchmark direction; doc 1 orthogonal
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<float>")
    vpath = str(tmp_path / "vecs.parquet")
    vecs.write.parquet(vpath)
    bvec = spark.createDataFrame(
        [(900, [3.0, 0.0])], "vec_id long, embedding array<float>")
    bpath = str(tmp_path / "bvecs.parquet")
    bvec.write.parquet(bpath)
    out = str(tmp_path / "published")

    rc = main(["-curate", src, "-out", out, "-files_per_split", "1",
               "-embeddings", vpath, "-bench_embeddings", bpath])
    assert rc == 0
    manifest = spark.read.parquet(os.path.join(out, "manifest.parquet"))
    assert {r.doc_id for r in manifest.collect()} == {1}

    # one flag without the other is a usage error
    import pytest
    with pytest.raises(SystemExit):
        main(["-curate", src, "-out", out, "-embeddings", vpath])


def test_cli_curate_boiler_df_scrubs_published_text(tmp_path, spark, capsys):
    from pyspark.sql import functions as F
    base = ("the quick brown fox jumps over the lazy dog and runs to the "
            "river every morning for a drink of cold clear water ")
    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(base), F.lit("variant word "), F.col("id"),
                 F.lit("\nsubscribe to our newsletter")).alias("text"))
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "published")

    rc = main(["-curate", src, "-out", out, "-files_per_split", "1",
               "-boiler_df", "1"])
    assert rc == 0
    corpus = spark.read.parquet(os.path.join(out, "corpus"))
    assert corpus.count() > 0
    # the shared newsletter line is gone from every published doc; the
    # unique first line survives intact
    assert corpus.filter(
        F.col("text").contains("subscribe to our newsletter")).count() == 0
    row = corpus.limit(1).collect()[0]
    assert row.text.startswith(base) and "\n" not in row.text


def test_cli_curate_reads_jsonl_input(tmp_path, spark, capsys):
    import json as _json
    base = ("the quick brown fox jumps over the lazy dog and runs to the "
            "river every morning for a drink of cold clear water ")
    d = str(tmp_path / "crawl")
    os.makedirs(d)
    with open(os.path.join(d, "dump.jsonl"), "w") as fh:
        for i in range(30):
            fh.write(_json.dumps({
                "doc_id": i, "text": base + f"variant word {i}",
                "lang": "en", "source": "crawl"}) + "\n")
    out = str(tmp_path / "published")
    rc = main(["-curate", d, "-input_format", "jsonl", "-out", out,
               "-files_per_split", "1"])
    assert rc == 0
    assert "published:" in capsys.readouterr().out
    corpus = spark.read.parquet(os.path.join(out, "corpus"))
    assert corpus.count() > 0
    assert corpus.limit(1).collect()[0].text.startswith(base)


def test_cli_compact_streamed_output(tmp_path, spark, capsys):
    from cloudbrush_spark.streaming.windows import (
        DOC_SCHEMA, read_document_stream, stream_publish)
    src = str(tmp_path / "docs")
    for i in range(2):
        spark.createDataFrame([(10 * i + j, f"d{j}") for j in range(3)],
                              DOC_SCHEMA).coalesce(1).write.parquet(f"{src}/f{i}")
    streamed = str(tmp_path / "streamed")
    os.makedirs(streamed)
    q = (stream_publish(read_document_stream(spark, src + "/*",
                                             max_files_per_trigger=1), streamed)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    out = str(tmp_path / "compacted")
    rc = main(["-compact", streamed, "-out", out, "-files_per_split", "1"])
    assert rc == 0
    assert "compacted: 2 batches" in capsys.readouterr().out
    assert spark.read.parquet(out).count() == 6

    import pytest
    with pytest.raises(SystemExit):
        main(["-compact", streamed])  # -out required


def test_cli_sql_runs_query_over_registered_views(tmp_path, spark, capsys):
    """-sql executes a textual query over the -data views and prints
    JSON rows; -out writes parquet instead."""
    import json
    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    rc = main(["-sql",
               "SELECT n_name, count(*) AS n FROM nation "
               "GROUP BY n_name ORDER BY n_name LIMIT 3",
               "-data", sf])
    assert rc == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    rows = [json.loads(ln) for ln in lines]
    assert rows and all(r["n"] == 1 for r in rows)
    assert rows == sorted(rows, key=lambda r: r["n_name"])
    # -out writes parquet
    outp = str(tmp_path / "sqlout")
    rc = main(["-sql", "SELECT count(*) AS n FROM region",
               "-data", sf, "-out", outp])
    assert rc == 0
    assert spark.read.parquet(outp).first().n == 5


def test_cli_sql_release_views_and_pushdown(tmp_path, spark, capsys):
    """-release registers corpus/release_manifest views; and the view
    layer is purely logical — a filtered SQL over a table view still
    pushes the predicate into the parquet scan (the temp view costs
    nothing over the DataFrame API)."""
    from cloudbrush_spark import sql as cbsql
    from cloudbrush_spark import plans
    from cloudbrush_spark.pipeline.release import release
    from tests.test_release import _docs_distinct
    out0 = str(tmp_path / "rel")
    release(spark, _docs_distinct(spark, 12), out0, max_tokens=2000)
    rc = main(["-sql",
               "SELECT count(*) AS n FROM corpus JOIN release_manifest "
               "USING (doc_id)", "-release", out0])
    assert rc == 0
    assert '"n":' in capsys.readouterr().out.replace(" ", "")
    # pushdown through a view
    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    cbsql.register_table_views(spark, sf, tables=("part",))
    q = cbsql.run_sql(spark,
                      "SELECT p_partkey FROM part WHERE p_size > 40")
    pushed = plans.pushed_filters(q)
    assert pushed and "p_size" in pushed[0]
    schemas = plans.read_schema(q)
    assert schemas and "p_name" not in schemas[0]


def test_cli_sql_without_views_errors(tmp_path, spark):
    import pytest
    with pytest.raises(SystemExit):
        main(["-sql", "SELECT 1"])


def test_sql_release_side_tables_registered(tmp_path, spark, capsys):
    """register_release_views exposes every side table the release
    wrote (delta/features from an incremental run) alongside
    corpus/release_manifest."""
    from cloudbrush_spark import sql as cbsql
    from cloudbrush_spark.pipeline.release import incremental_release, release
    from tests.test_release import _distinct_snapshot_and_crawl
    base, crawl = _distinct_snapshot_and_crawl(spark)
    out0, out1 = str(tmp_path / "r0"), str(tmp_path / "r1")
    release(spark, base, out0, max_tokens=2000, cache_features=True)
    prev = spark.read.parquet(os.path.join(out0, "features.parquet"))
    incremental_release(spark, base, crawl, out1, prev_features=prev,
                        max_tokens=2000)
    views = cbsql.register_release_views(spark, out1)
    assert {"corpus", "release_manifest", "delta", "features"} <= set(views)
    n = cbsql.run_sql(
        spark, "SELECT count(*) AS n FROM delta WHERE action = 'insert'"
    ).first().n
    assert n == 2


def test_cli_prior_embeddings_and_dsir(tmp_path, spark, capsys):
    """-prior_embeddings/-dsir_target run the release pipeline with the
    r11 gates; -prior_embeddings without -embeddings is refused."""
    import pytest

    from cloudbrush_spark.__main__ import main
    from tests.test_release import _docs_distinct, _emb_for
    docs = _docs_distinct(spark, 12)
    p = str(tmp_path / "d.parquet")
    docs.write.parquet(p)
    emb = _emb_for(docs, spark)
    e_p = str(tmp_path / "emb.parquet")
    emb.write.parquet(e_p)
    pe_p = str(tmp_path / "prior.parquet")
    emb.filter("doc_id < 6").write.parquet(pe_p)
    t_p = str(tmp_path / "target.parquet")
    docs.filter("doc_id % 2 = 0").select("doc_id", "text") \
        .write.parquet(t_p)
    with pytest.raises(SystemExit, match="requires -embeddings"):
        main(["-curate", p, "-out", str(tmp_path / "x"),
              "-prior_embeddings", pe_p])
    out = str(tmp_path / "rel")
    rc = main(["-curate", p, "-out", out, "-max_tokens", "2000",
               "-embeddings", e_p, "-prior_embeddings", pe_p,
               "-emb_dedup_threshold", "0.99", "-dsir_target", t_p])
    assert rc == 0
    import os

    from cloudbrush_spark.sources import corpus as corpus_sink
    kept = {r.doc_id for r in corpus_sink.read_corpus(
        spark, os.path.join(out, "corpus")).select("doc_id").collect()}
    assert kept == set(range(6, 12)), kept
    assert os.path.exists(os.path.join(out, "dsir.parquet"))


def test_cli_prior_index_gate(tmp_path, spark, capsys):
    """-prior_index runs the index-backed embedding-dedup gate; the
    flag-pairing guards refuse the ambiguous combinations."""
    import pytest

    from cloudbrush_spark.__main__ import main
    from cloudbrush_spark.operators import similarity
    from tests.test_release import _docs_distinct, _emb_for
    docs = _docs_distinct(spark, 12)
    p = str(tmp_path / "d.parquet")
    docs.write.parquet(p)
    emb = _emb_for(docs, spark)
    e_p = str(tmp_path / "emb.parquet")
    emb.write.parquet(e_p)
    idx = str(tmp_path / "idx")
    similarity.write_ivf_index(emb.filter("doc_id < 6"), idx,
                               n_centroids=4, seed=42, id_col="doc_id",
                               quantized=True)
    with pytest.raises(SystemExit, match="mutually exclusive"):
        main(["-curate", p, "-out", str(tmp_path / "x"),
              "-embeddings", e_p, "-prior_embeddings", e_p,
              "-prior_index", idx])
    out = str(tmp_path / "rel")
    rc = main(["-curate", p, "-out", out, "-max_tokens", "2000",
               "-embeddings", e_p, "-prior_index", idx,
               "-prior_index_nprobe", "4",
               "-emb_dedup_threshold", "0.99"])
    assert rc == 0
    import os

    from cloudbrush_spark.sources import corpus as corpus_sink
    kept = {r.doc_id for r in corpus_sink.read_corpus(
        spark, os.path.join(out, "corpus")).select("doc_id").collect()}
    assert kept == set(range(6, 12)), kept


def test_cli_append_index(tmp_path, spark, capsys):
    """-append_index drives the crawl-per-day index maintenance flow
    from the CLI (r12): append new embeddings to an existing quantized
    index, idempotent on replay; refuses without -embeddings."""
    import random as _rnd

    import pytest
    from pyspark.sql import functions as F

    from cloudbrush_spark.operators import similarity
    rng = _rnd.Random(13)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = str(tmp_path / "idx")
    similarity.write_ivf_index(vecs.filter(F.col("vec_id") < 50), idx,
                               n_centroids=4, seed=42, quantized=True)
    newp = str(tmp_path / "new.parquet")
    vecs.filter(F.col("vec_id") >= 50).write.parquet(newp)

    rc = main(["-append_index", idx, "-embeddings", newp])
    assert rc == 0
    assert "appended: 30 rows" in capsys.readouterr().out
    assert spark.read.parquet(idx + "/vectors").count() == 80
    # replay is a no-op through the CLI too
    rc = main(["-append_index", idx, "-embeddings", newp])
    assert rc == 0
    assert "appended: 0 rows" in capsys.readouterr().out
    assert spark.read.parquet(idx + "/vectors").count() == 80
    with pytest.raises(SystemExit, match="requires -embeddings"):
        main(["-append_index", idx])


def test_cli_append_index_resolves_index_id_column(tmp_path, spark, capsys):
    """The CLI appends under the INDEX's id column even when the crawl
    table names it differently (a release-written index uses doc_id,
    crawl embeddings usually vec_id) — a mismatched name would fork the
    bucket directories' parquet schema."""
    import random as _rnd

    from pyspark.sql import functions as F

    from cloudbrush_spark.operators import similarity
    rng = _rnd.Random(17)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    prior = spark.createDataFrame(
        rows[:25], "doc_id long, embedding array<double>")
    idx = str(tmp_path / "idx")
    similarity.write_ivf_index(prior, idx, n_centroids=4, seed=42,
                               id_col="doc_id", quantized=True)
    crawl = spark.createDataFrame(
        rows[25:], "vec_id long, embedding array<double>")
    newp = str(tmp_path / "new.parquet")
    crawl.write.parquet(newp)
    rc = main(["-append_index", idx, "-embeddings", newp])
    assert rc == 0
    assert "appended: 15 rows" in capsys.readouterr().out
    part = spark.read.parquet(idx + "/vectors")
    assert "doc_id" in part.columns and part.count() == 40


def test_cli_append_index_custom_vec_col_and_clear_errors(
        tmp_path, spark, capsys):
    """r13: the index's vector column is resolved from its SCHEMA (the
    array-typed column), not hardcoded to 'embedding' — a plain-layout
    index written with a custom vec_col appends correctly; and an
    embeddings table with no resolvable id column is a NAMED SystemExit
    instead of a confusing downstream error."""
    import random as _rnd

    import pytest
    from pyspark.sql import functions as F

    from cloudbrush_spark.operators import similarity
    rng = _rnd.Random(19)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    prior = spark.createDataFrame(
        rows[:25], "doc_id long, vec array<double>")
    idx = str(tmp_path / "idx")
    similarity.write_ivf_index(prior, idx, n_centroids=4, seed=42,
                               id_col="doc_id", vec_col="vec")
    crawl = spark.createDataFrame(
        rows[25:], "vec_id long, embedding array<double>")
    newp = str(tmp_path / "new.parquet")
    crawl.write.parquet(newp)
    rc = main(["-append_index", idx, "-embeddings", newp])
    assert rc == 0
    assert "appended: 15 rows" in capsys.readouterr().out
    part = spark.read.parquet(idx + "/vectors")
    assert {"doc_id", "vec"} <= set(part.columns) and part.count() == 40
    # no resolvable id column in the embeddings table -> named error
    bad = spark.createDataFrame(
        [(i, [0.1] * 8) for i in range(3)],
        "weird_id long, embedding array<double>")
    badp = str(tmp_path / "bad.parquet")
    bad.write.parquet(badp)
    with pytest.raises(SystemExit, match="neither it, 'vec_id'"):
        main(["-append_index", idx, "-embeddings", badp])


def test_cli_compact_index(tmp_path, spark, capsys):
    """-compact_index drives the r13 file-growth fix from the CLI."""
    import glob as _glob
    import random as _rnd

    from pyspark.sql import functions as F

    from cloudbrush_spark.operators import similarity
    rng = _rnd.Random(23)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = str(tmp_path / "idx")
    similarity.write_ivf_index(vecs.filter(F.col("vec_id") < 40), idx,
                               n_centroids=4, seed=42, quantized=True)
    for lo in (40, 60):
        similarity.append_to_ivf_index(
            vecs.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 20)),
            idx)
    before = len(_glob.glob(idx + "/vectors/**/*.parquet", recursive=True))
    rc = main(["-compact_index", idx])
    assert rc == 0
    assert "compacted index:" in capsys.readouterr().out
    after = len(_glob.glob(idx + "/vectors/**/*.parquet", recursive=True))
    assert after < before
    assert spark.read.parquet(idx + "/vectors").count() == 80


def test_private_tmp_root_rejects_symlink_and_lax_modes(tmp_path,
                                                        monkeypatch):
    """r13 advisor finding: the per-user deterministic cache root must
    be validated with lstat — a pre-created SYMLINK at the expected name
    (pointing at a directory the victim uid owns, e.g. /tmp when
    running as root) passed the old stat().st_uid check and reinstated
    the cache-poisoning vector.  Symlinks, non-directories and roots
    with group/other bits all fall back to a private mkdtemp; a clean
    pre-existing 0700 root is reused."""
    import os

    import __spark_entry__ as entrymod
    monkeypatch.setattr("tempfile.gettempdir", lambda: str(tmp_path))
    expect = str(tmp_path / f"cb_u{os.getuid()}")
    # fresh: created 0700 and reused on the second call
    root = entrymod._private_tmp_root()
    assert root == expect
    assert (os.lstat(root).st_mode & 0o777) == 0o700
    assert entrymod._private_tmp_root() == expect
    # symlink at the expected name -> mkdtemp fallback (never follows)
    os.rmdir(expect)
    os.symlink(str(tmp_path), expect)
    alt = entrymod._private_tmp_root()
    assert alt != expect and os.path.isdir(alt) and not os.path.islink(alt)
    os.remove(expect)
    # plain file at the expected name -> fallback
    open(expect, "w").close()
    alt2 = entrymod._private_tmp_root()
    assert alt2 != expect
    os.remove(expect)
    # group/other-readable pre-existing dir -> fallback
    os.makedirs(expect, mode=0o755)
    os.chmod(expect, 0o755)
    alt3 = entrymod._private_tmp_root()
    assert alt3 != expect


def test_cli_index_stats(tmp_path, spark, capsys):
    """-index_stats prints the operational snapshot as one JSON line."""
    import json as _json
    import random as _rnd

    from cloudbrush_spark.operators import similarity
    rng = _rnd.Random(29)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = str(tmp_path / "idx")
    similarity.write_ivf_index(vecs, idx, n_centroids=4, seed=42,
                               quantized=True)
    rc = main(["-index_stats", idx])
    assert rc == 0
    st = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["rows"] == 50 and st["n_centroids"] == 4
    assert st["compacting"] is False


def test_cli_append_index_ambiguous_vec_col_is_named_error(tmp_path, spark):
    """r14 (advisor finding): when the index's vector source has zero or
    multiple candidate array columns, the CLI raises a NAMED SystemExit
    listing them instead of silently guessing 'embedding' — a wrong
    silent pick forks the bucket directories' parquet schema."""
    import pytest

    df = spark.createDataFrame(
        [(1, [0.1] * 4, [0.2] * 4, 0)],
        "doc_id long, v1 array<double>, v2 array<double>, bucket int")
    idx = str(tmp_path / "idx")
    df.write.partitionBy("bucket").parquet(idx + "/vectors")
    emb = spark.createDataFrame(
        [(2, [0.3] * 4)], "doc_id long, embedding array<double>")
    newp = str(tmp_path / "new.parquet")
    emb.write.parquet(newp)
    with pytest.raises(SystemExit,
                       match="cannot resolve the index vector column"):
        main(["-append_index", idx, "-embeddings", newp])


def test_cli_split_index(tmp_path, spark, capsys):
    """-split_index drives the r14 drift remedy from the CLI: a drifted
    index's skew drops, the summary prints as JSON, and a healthy index
    is a no-op."""
    import json as _json
    import random as _rnd

    from cloudbrush_spark.operators import similarity
    rng = _rnd.Random(23)

    def cluster(c, n, base):
        ctr = [10.0 * (1 if i == c else 0) for i in range(8)]
        return [(base + j, [x + rng.gauss(0, 0.5) for x in ctr])
                for j in range(n)]

    train = spark.createDataFrame(
        cluster(0, 100, 0), "vec_id long, embedding array<double>")
    idx = str(tmp_path / "idx")
    similarity.write_ivf_index(train, idx, n_centroids=8, seed=42,
                               quantized=True)
    drift = spark.createDataFrame(
        cluster(1, 150, 1000) + cluster(2, 150, 2000),
        "vec_id long, embedding array<double>")
    assert similarity.append_to_ivf_index(drift, idx) == 300
    rc = main(["-split_index", idx, "-skew_threshold", "3.0"])
    assert rc == 0
    s = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["split_buckets"] and s["n_centroids_after"] > 8
    # second run: healthy now (or at least strictly less to do)
    rc = main(["-split_index", idx, "-skew_threshold", "3.0"])
    assert rc == 0


def test_cli_merge_and_rebalance_index(tmp_path, spark, capsys):
    """-merge_index folds thin buckets from the CLI (JSON summary);
    -rebalance_index chains split+merge on a drifted index and the
    resulting centroid set stays contiguous."""
    import json as _json
    import random as _rnd

    from cloudbrush_spark.operators import similarity
    from pyspark.sql import functions as F
    rng = _rnd.Random(31)

    def cluster(sign, n, base):
        return [(base + j, [sign * 10.0 + rng.gauss(0, 0.5)
                            for _ in range(8)]) for j in range(n)]

    rows = cluster(1, 100, 0) + cluster(-1, 100, 500)
    rows += [(900 + i, [100.0 + 7.0 * i if d == i else 0.0
                        for d in range(8)]) for i in range(3)]
    vecs = spark.createDataFrame(rows,
                                 "vec_id long, embedding array<double>")
    idx = str(tmp_path / "idx")
    similarity.write_ivf_index(vecs, idx, n_centroids=8, seed=42,
                               quantized=True)
    # the sqrt(corpus) default floor (15 > K=8 here) correctly refuses
    # to shrink a small index; an explicit -k_floor overrides it
    rc = main(["-merge_index", idx, "-small_threshold", "3.0"])
    assert rc == 0
    s = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["merged_buckets"] == []
    rc = main(["-merge_index", idx, "-small_threshold", "3.0",
               "-k_floor", "2"])
    assert rc == 0
    s = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["merged_buckets"], s
    assert s["n_centroids_after"] < s["n_centroids_before"]
    cent = sorted(r.bucket for r in
                  spark.read.parquet(idx + "/centroids").collect())
    assert cent == list(range(s["n_centroids_after"]))

    # rebalance on a drifted index: split then merge in one call
    rng2 = _rnd.Random(23)

    def dcluster(c, n, base):
        ctr = [10.0 * (1 if i == c else 0) for i in range(8)]
        return [(base + j, [x + rng2.gauss(0, 0.5) for x in ctr])
                for j in range(n)]

    train = spark.createDataFrame(
        dcluster(0, 100, 0), "vec_id long, embedding array<double>")
    idx2 = str(tmp_path / "idx2")
    similarity.write_ivf_index(train, idx2, n_centroids=8, seed=42,
                               quantized=True)
    drift = spark.createDataFrame(
        dcluster(1, 150, 1000) + dcluster(2, 150, 2000),
        "vec_id long, embedding array<double>")
    assert similarity.append_to_ivf_index(drift, idx2) == 300
    rc = main(["-rebalance_index", idx2, "-skew_threshold", "3.0",
               "-small_threshold", "3.0"])
    assert rc == 0
    s2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["split"]["split_buckets"]
    k = spark.read.parquet(idx2 + "/centroids").count()
    assert sorted(r.bucket for r in
                  spark.read.parquet(idx2 + "/centroids").collect()) \
        == list(range(k))
    mx = spark.read.parquet(idx2 + "/vectors") \
        .agg(F.max("bucket")).collect()[0][0]
    assert mx < k


def test_cli_delete_undelete_index(tmp_path, spark, capsys):
    """-delete_index tombstones ids from the CLI (comma list), probes
    exclude them, -undelete_index lifts them."""
    import json as _json
    import random as _rnd

    from cloudbrush_spark.operators import similarity
    rng = _rnd.Random(5)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(60)]
    vecs = spark.createDataFrame(rows,
                                 "vec_id long, embedding array<double>")
    idx = str(tmp_path / "idx")
    similarity.write_ivf_index(vecs, idx, n_centroids=4, seed=42,
                               quantized=True)
    rc = main(["-delete_index", idx, "-ids", "3,4"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"tombstoned": 2}
    assert similarity.index_stats(spark, idx)["pending_deletes"] == 2
    rc = main(["-undelete_index", idx, "-ids", "4,99"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"lifted": 1}
    assert similarity.index_stats(spark, idx)["pending_deletes"] == 1
