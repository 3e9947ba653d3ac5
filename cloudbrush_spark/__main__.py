"""CLI mirroring the reference driver's invocation surface
(src/Brush/BrushConfig.java:207-406, BrushAssembler.java:781-916), so a
CloudBrush user can run the same commands against this engine:

    # full assembly (reference: hadoop jar CloudBrush.jar ...)
    python -m cloudbrush_spark -reads Ec10k.sim.sfa -asm out/ -k 21 -readlen 36

    # stats only (reference -run_stats; -genome adds the genome-target N50)
    python -m cloudbrush_spark -run_stats out/ -genome 10232

    # conversion only (reference -convert_fa)
    python -m cloudbrush_spark -convert_fa out/

Option names match the reference's commons-cli flags (-k, -readlen,
-kmerup, -kmerlow, -kmercov, -bubbleerate, -maj, -N, -lowcov, -slots,
-nodes, -genome).  The reference's restart flags (-start/-stop/
-restart_*) are subsumed by ``-ckpt DIR``: every major stage persists to
parquet there and finished stages are loaded, not recomputed — the same
partial-run machinery, keyed by stage completion markers instead of
stage names.

Output layout under -asm: ``nodes.parquet`` + ``edges.parquet`` (the
typed node/edge tables — the engine's IR, replacing the reference's
HDFS text directories), ``contigs.fa`` (K1 FASTA sink), and a printed
stage-counter + stats report.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="python -m cloudbrush_spark", add_help=True,
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("-reads", help="input reads: .sfa (tab-separated) or .fastq")
    ap.add_argument("-asm", help="output assembly directory")
    ap.add_argument("-k", type=int, default=21, help="overlap seed size")
    ap.add_argument("-readlen", type=int, default=36, help="read length")
    ap.add_argument("-kmerup", type=int, default=2000, help="max kmer cov / per-key cap")
    ap.add_argument("-kmerlow", type=int, default=1, help="min candidates per kmer key")
    ap.add_argument("-kmercov", type=float, default=30.0, help="expected kmer coverage (A-stat)")
    ap.add_argument("-bubbleerate", type=float, default=0.05, help="max bubble error rate")
    ap.add_argument("-maj", type=float, default=0.6, help="PWM consensus majority")
    ap.add_argument("-N", type=float, default=0.1, dest="pwm_n", help="PWM N threshold")
    ap.add_argument("-lowcov", type=float, default=1.0, help="low-coverage cutoff")
    ap.add_argument("-slots", type=int, default=None,
                    help="parallelism (shuffle partitions); default: session")
    ap.add_argument("-nodes", type=int, default=4096,
                    help="serial-contraction threshold (reference -nodes; "
                         "reference default 1000, ours 4096)")
    ap.add_argument("-precorrect", action="store_true",
                    help="A8 spaced-seed error correction before dedup")
    ap.add_argument("-ckpt", default=None,
                    help="stage-checkpoint dir (restartable partial runs)")
    ap.add_argument("-sql", default=None, metavar="QUERY",
                    help="raw-SQL entry point: run QUERY via spark.sql "
                         "over the temp views registered from -data "
                         "(analytic tables) and/or -release (published "
                         "corpus + release_manifest); prints rows as "
                         "JSON lines (capped by -limit) or writes "
                         "parquet with -out")
    ap.add_argument("-data", default=None, metavar="DIR",
                    help="-sql: parquet table directory whose tables "
                         "register as temp views (region/nation/.../"
                         "documents/embeddings)")
    ap.add_argument("-release", default=None, metavar="DIR",
                    help="-sql: published release directory to register "
                         "as corpus/release_manifest views")
    ap.add_argument("-limit", type=int, default=100,
                    help="-sql: max rows printed without -out")
    ap.add_argument("-run_stats", default=None, metavar="DIR",
                    help="stats-only entry point over DIR's nodes.parquet")
    ap.add_argument("-genome", type=int, default=None,
                    help="genome size (bp) for the genome-target N50")
    ap.add_argument("-convert_fa", default=None, metavar="DIR",
                    help="conversion-only entry point over DIR's nodes.parquet")
    # corpus-curation entry point (the LLM-data surface; no reference
    # analogue — the document generalization of preprocess+dedup+emit)
    ap.add_argument("-curate", default=None, metavar="PARQUET",
                    help="curation entry point: documents parquet with "
                         "(doc_id, text); requires -out")
    ap.add_argument("-out", default=None,
                    help="publish directory for -curate (split-partitioned "
                         "parquet + manifest.parquet)")
    ap.add_argument("-quality_min", type=float, default=0.5,
                    help="curation: min composite quality score")
    ap.add_argument("-lang", default="en", help="curation: required language")
    ap.add_argument("-min_tokens", type=int, default=10,
                    help="curation: drop docs with fewer whitespace tokens")
    ap.add_argument("-max_tokens", type=int, default=1000,
                    help="curation: drop docs with MORE whitespace tokens "
                         "than this — the default (1000) suits short-doc "
                         "corpora; RAISE it for web pages / papers / books "
                         "or most of a long-document corpus is silently "
                         "gated out")
    ap.add_argument("-files_per_split", type=int, default=16,
                    help="curation: output parquet files per split")
    ap.add_argument("-benchmark", default=None, metavar="PARQUET",
                    help="curation: held-out eval set parquet with "
                         "(doc_id, text); gated docs sharing a "
                         "-decontam_n word n-gram with it are dropped")
    ap.add_argument("-decontam_n", type=int, default=13,
                    help="curation: decontamination n-gram size")
    ap.add_argument("-bench_embeddings", default=None, metavar="PARQUET",
                    help="curation: benchmark embeddings parquet (vec_id, "
                         "embedding); with -embeddings, gated docs within "
                         "-semantic_threshold cosine of any benchmark "
                         "vector are dropped (semantic decontamination)")
    ap.add_argument("-embeddings", default=None, metavar="PARQUET",
                    help="curation: corpus embeddings parquet keyed by the "
                         "document id (vec_id column)")
    ap.add_argument("-semantic_threshold", type=float, default=0.95,
                    help="curation: semantic decontamination cosine cutoff")
    ap.add_argument("-prior_embeddings", default=None, metavar="PARQUET",
                    help="release: the PREVIOUS release's embeddings "
                         "parquet (vec_id/doc_id, embedding); with "
                         "-embeddings, new docs whose embedding "
                         "near-duplicates the prior release (cosine >= "
                         "-emb_dedup_threshold) are dropped after curation "
                         "(cross-corpus embedding dedup gate)")
    ap.add_argument("-emb_dedup_threshold", type=float, default=0.95,
                    help="release: cross-release embedding dedup cutoff")
    ap.add_argument("-write_index", action="store_true",
                    help="release: after publish, write the published "
                         "docs' embeddings as a quantized IVF index at "
                         "<out>/emb_index (requires -embeddings) — the "
                         "-prior_index input of the NEXT release")
    ap.add_argument("-prior_index", default=None, metavar="DIR",
                    help="release: a persisted IVF index of the previous "
                         "release (similarity.write_ivf_index over its "
                         "doc_id/embedding table) — the index-backed form "
                         "of -prior_embeddings; each new doc probes "
                         "nprobe buckets instead of an all-pairs LSH pass")
    ap.add_argument("-prior_index_nprobe", type=int, default=None,
                    help="release: buckets each new doc probes in the "
                         "-prior_index gate — the recall/IO lever "
                         "(gate-level recall contract in "
                         "tests/test_release.py).  Default: auto-scaled "
                         "to the index's centroid count (sqrt-K; "
                         "similarity.auto_nprobe)")
    ap.add_argument("-compact_index", default=None, metavar="DIR",
                    help="compact an appended IVF index's accreted "
                         "per-append files in place (markers/replay "
                         "contract preserved; similarity.compact_index)")
    ap.add_argument("-compact_repair", action="store_true",
                    help="with -compact_index: finish/roll back a "
                         "crashed compaction's swap before compacting")
    ap.add_argument("-split_index", default=None, metavar="DIR",
                    help="re-cluster an IVF index's over-skewed buckets "
                         "in place (the remedy for index_stats' "
                         "bucket_skew drift signal; markers/replay "
                         "preserved; similarity.split_fat_buckets)")
    ap.add_argument("-skew_threshold", type=float, default=4.0,
                    help="with -split_index: split buckets holding more "
                         "than this multiple of the median bucket's "
                         "rows (default 4.0)")
    ap.add_argument("-split_repair", action="store_true",
                    help="with -split_index: finish/roll back a crashed "
                         "split's swap before splitting")
    ap.add_argument("-merge_index", default=None, metavar="DIR",
                    help="merge an IVF index's under-populated buckets "
                         "into their nearest neighbors in place "
                         "(renumbered contiguously; markers/replay "
                         "preserved; similarity.merge_small_buckets)")
    ap.add_argument("-small_threshold", type=float, default=None,
                    help="with -merge_index/-rebalance_index/"
                         "-maintain_index: merge buckets holding fewer "
                         "than sqrt(corpus)/this rows (default 4.0 for "
                         "-merge_index, conservative 8.0 inside "
                         "rebalance/maintain); never merges below the "
                         "sqrt(corpus) centroid floor")
    ap.add_argument("-merge_repair", action="store_true",
                    help="with -merge_index: roll a crashed merge "
                         "forward from its committed plan before "
                         "merging")
    ap.add_argument("-k_floor", type=int, default=None,
                    help="with -merge_index: never merge below this "
                         "many centroids (default: the ceil(sqrt("
                         "corpus)) IVF sizing rule)")
    ap.add_argument("-rebalance_index", default=None, metavar="DIR",
                    help="full drift maintenance: split fat buckets "
                         "then merge thin ones back toward the sqrt(n) "
                         "centroid floor (uses -skew_threshold and "
                         "-small_threshold; similarity.rebalance_index)")
    ap.add_argument("-maintain_index", default=None, metavar="DIR",
                    help="one cron-able maintenance pass: read "
                         "index_stats and run exactly what the index "
                         "needs — rebalance past -skew_threshold, "
                         "compact past ~8 files/bucket or with "
                         "tombstones pending; no-op when healthy "
                         "(similarity.maintain_index)")
    ap.add_argument("-delete_index", default=None, metavar="DIR",
                    help="tombstone ids in an IVF index (takedown "
                         "lever): effective immediately at probe time, "
                         "purged physically by the next -compact_index "
                         "(similarity.delete_from_ivf_index; requires "
                         "-ids)")
    ap.add_argument("-undelete_index", default=None, metavar="DIR",
                    help="lift pending tombstones not yet purged "
                         "(similarity.undelete_from_ivf_index; "
                         "requires -ids)")
    ap.add_argument("-ids", default=None,
                    help="with -delete_index/-undelete_index: comma-"
                         "separated id list, or a path to a parquet "
                         "of ids (single column or the index id "
                         "column)")
    ap.add_argument("-index_stats", default=None, metavar="DIR",
                    help="print an IVF index's operational snapshot as "
                         "JSON: bucket-size histogram + skew (the "
                         "frozen-centroid drift signal), file counts "
                         "(the compaction signal), marker/intent state "
                         "(similarity.index_stats)")
    ap.add_argument("-append_index", default=None, metavar="DIR",
                    help="append -embeddings' vectors to an EXISTING "
                         "persisted IVF index (plain or quantized "
                         "layout) without a rebuild — the crawl-per-day "
                         "maintenance flow (similarity."
                         "append_to_ivf_index: frozen centroids, "
                         "idempotent batch commit markers; prints the "
                         "rows appended, 0 for a replayed batch).  The "
                         "embeddings table's id column is vec_id, or "
                         "doc_id if vec_id is absent")
    ap.add_argument("-dsir_target", default=None, metavar="PARQUET",
                    help="release: target-domain docs parquet (doc_id, "
                         "text); writes DSIR importance weights of the "
                         "published docs to <out>/dsir.parquet")
    # full-release flags: either one upgrades -curate to the resumable
    # curate -> mixture -> shard-pack -> publish chain
    # (pipeline/release.py), the analogue of the reference's single
    # -reads -> -asm driver chain; -ckpt makes the chain restartable
    ap.add_argument("-mixture", default=None, metavar="JSON",
                    help="release: domain-mixture weights as a JSON object "
                         "{source: weight}; w>1 up-samples (copy column), "
                         "w<1 down-samples deterministically")
    ap.add_argument("-budget", type=int, default=None, metavar="TOKENS",
                    help="release: shard token budget — packs published "
                         "rows into fixed-weight shards (shard_id/offset "
                         "columns)")
    ap.add_argument("-token_budget", type=int, default=None,
                    metavar="TOKENS",
                    help="release: global quality-ordered token cap — "
                         "spend at most this many whitespace tokens on "
                         "the best mixture rows (sampling.budget_select)")
    ap.add_argument("-src_budget", default=None, metavar="JSON",
                    help="release: per-source token budgets as a JSON "
                         "object {source: tokens} — each domain fills "
                         "its own cap by quality "
                         "(sampling.budget_select_per_source); mutually "
                         "exclusive with -token_budget")
    ap.add_argument("-boiler_df", type=int, default=None, metavar="N",
                    help="curation: remove every line whose corpus-wide "
                         "occurrence count exceeds N (cross-document "
                         "boilerplate scrub) before gating/publishing")
    ap.add_argument("-scrub_spans_df", type=int, default=None, metavar="N",
                    help="curation: remove every cross-document repeated "
                         "passage (maximal run of word 13-grams shared "
                         "by >= N docs) from ALL carriers before "
                         "gating/publishing (guard.span_scrub — the "
                         "scrub counterpart of -audit_spans)")
    ap.add_argument("-report", action="store_true",
                    help="write the published corpus's data card "
                         "(operators/report.corpus_report — per-split "
                         "volumes, quality/length histograms, dup rate, "
                         "token quantiles, sketch contracts) to "
                         "OUT/report.parquet")
    ap.add_argument("-audit_spans", action="store_true",
                    help="write the released corpus's repeated-content "
                         "audit (guard.repeated_spans — maximal cross-"
                         "document repeated passages, the memorization-"
                         "risk appendix) to OUT/spans.parquet")
    ap.add_argument("-base", default=None, metavar="PARQUET",
                    help="release: previous snapshot corpus — upgrades "
                         "the release to an INCREMENTAL release "
                         "(pipeline/release.incremental_release): a "
                         "merge_upsert delta against -curate's input "
                         "decides insert/update/keep/delete, per-doc "
                         "gate features recompute only for the delta, "
                         "and every cross-document stage reruns "
                         "globally (output identical to a from-scratch "
                         "release of the new snapshot)")
    ap.add_argument("-prev_features", default=None, metavar="PARQUET",
                    help="release: the previous release's feature cache "
                         "(OUT/features.parquet, written by "
                         "-cache_features or a prior incremental run) — "
                         "kept documents reuse these rows instead of "
                         "re-running the gate projection")
    ap.add_argument("-cache_features", action="store_true",
                    help="release: write the per-document gate-feature "
                         "cache to OUT/features.parquet so the next "
                         "crawl can release incrementally")
    ap.add_argument("-prev_release", default=None, metavar="DIR",
                    help="incremental release: the previous release's "
                         "output directory — the PUBLISH stage then "
                         "rewrites only the bucket directories the "
                         "delta touches and hardlinks the rest over "
                         "(the previous release must have been "
                         "published bucketed, e.g. via -bucket_width)")
    ap.add_argument("-bucket_width", type=int, default=None,
                    help="release: publish the corpus in the bucketed "
                         "directory layout with id-range buckets of "
                         "this width (floor(id/W)) — the layout "
                         "incremental publish carries directories "
                         "over from; omit for the classic flat layout")
    ap.add_argument("-prior", default=None, metavar="PARQUET",
                    help="curation: previous-release corpus (doc_id, "
                         "text) — drop gated docs that near-duplicate "
                         "any prior-release document (cross-corpus "
                         "MinHash dedup)")
    ap.add_argument("-input_format", default="parquet",
                    choices=["parquet", "jsonl", "csv"],
                    help="physical format of the -curate input (crawl "
                         "dumps usually arrive as JSONL; both text "
                         "formats read with an explicit schema and "
                         "PERMISSIVE corrupt-row handling — "
                         "sources/textfiles.py)")
    ap.add_argument("-compact", default=None, metavar="STREAM_DIR",
                    help="compact a streaming-publish output directory "
                         "(batch=N small files from streaming.stream_publish) "
                         "into bounded id-sorted parquet at -out; reads "
                         "only committed batches, safe beside the live "
                         "stream (file count = -files_per_split)")
    ap.add_argument("-input_schema",
                    default="doc_id long, text string, lang string, "
                            "source string",
                    help="explicit DDL schema for jsonl/csv -curate "
                         "inputs (ignored for parquet; inference is "
                         "deliberately not offered)")
    return ap


def _load_nodes(spark, dirpath: str):
    path = os.path.join(dirpath, "nodes.parquet")
    if not os.path.exists(path):
        raise SystemExit(f"no nodes.parquet under {dirpath!r} "
                         "(expected an -asm output directory)")
    return spark.read.parquet(path)


def _print_stats(report: dict) -> None:
    print("== size distribution (per cutoff) ==")
    report["distribution"].show(50, truncate=False)
    print("== top contigs ==")
    report["top"].show(10, truncate=False)
    if report.get("genome_n50") is not None:
        print("== genome-target N50 ==")
        report["genome_n50"].show(truncate=False)


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from cloudbrush_spark.session import get_spark
    extra = {}
    if args.slots:
        extra["spark.sql.shuffle.partitions"] = str(args.slots)
    spark = get_spark("cloudbrush", extra_conf=extra or None)

    if args.sql:
        from cloudbrush_spark import sql as cbsql
        views: list[str] = []
        if args.data:
            views += cbsql.register_table_views(spark, args.data)
        if args.release:
            views += cbsql.register_release_views(spark, args.release)
        if not views:
            raise SystemExit("-sql needs -data DIR and/or -release DIR "
                             "to register views")
        df = cbsql.run_sql(spark, args.sql)
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        else:
            for r in df.limit(args.limit).collect():
                print(json.dumps(r.asDict(), default=str))
        return 0

    if args.run_stats:
        from cloudbrush_spark.pipeline.assembler import Assembler
        nodes = _load_nodes(spark, args.run_stats)
        _print_stats(Assembler(spark).stats_report(nodes, genome_size=args.genome))
        return 0

    if args.convert_fa:
        from cloudbrush_spark.sources.fasta import write_fasta
        nodes = _load_nodes(spark, args.convert_fa)
        out = os.path.join(args.convert_fa, "contigs.fa")
        write_fasta(nodes, out)
        print(f"wrote {out}")
        return 0

    if args.append_index:
        if not args.embeddings:
            raise SystemExit("-append_index requires -embeddings "
                             "(the new crawl's vectors)")
        from pyspark.sql.types import ArrayType

        from cloudbrush_spark.operators.similarity import (
            _infer_index_id_col, append_to_ivf_index)
        vecs = spark.read.parquet(args.embeddings)
        # the INDEX's id column is authoritative (a release-written
        # index uses doc_id, standalone ones usually vec_id) — appending
        # under a different id name would fork the parquet schema.
        # Resolution is schema-typed, not name-guessed (r13, advisor
        # finding): the id is the single non-array non-layout column,
        # and an unrecognizable layout is a named error, not a silent
        # wrong pick.
        idx_schema = spark.read.parquet(
            args.append_index + "/vectors").schema
        try:
            idx_id = _infer_index_id_col(idx_schema.fields)
        except ValueError as e:
            raise SystemExit(f"-append_index: {e}")
        quantized = "q_codes" in idx_schema.fieldNames()
        vec_src = (args.append_index + "/doubles") if quantized \
            else (args.append_index + "/vectors")
        vec_arrays = [f.name for f in
                      spark.read.parquet(vec_src).schema.fields
                      if isinstance(f.dataType, ArrayType)
                      and f.name != "q_codes"]
        # same contract as the id column (r14, advisor finding): an
        # unrecognizable vector layout is a NAMED error, not a silent
        # 'embedding' guess — a wrong pick forks the parquet schema the
        # same way a wrong id would
        if len(vec_arrays) != 1:
            raise SystemExit(
                f"-append_index: cannot resolve the index vector "
                f"column: expected exactly one non-code array column "
                f"in {vec_src}, found {vec_arrays or 'none'}")
        idx_vec = vec_arrays[0]
        if idx_id not in vecs.columns:
            src = next((c for c in ("vec_id", "doc_id")
                        if c in vecs.columns), None)
            if src is None:
                raise SystemExit(
                    f"-append_index: the index id column is "
                    f"'{idx_id}' but the embeddings table has neither "
                    f"it, 'vec_id', nor 'doc_id' (columns: "
                    f"{vecs.columns})")
            vecs = vecs.withColumnRenamed(src, idx_id)
        if idx_vec not in vecs.columns:
            if "embedding" in vecs.columns:
                vecs = vecs.withColumnRenamed("embedding", idx_vec)
            else:
                raise SystemExit(
                    f"-append_index: the index vector column is "
                    f"'{idx_vec}' but the embeddings table has neither "
                    f"it nor 'embedding' (columns: {vecs.columns})")
        n = append_to_ivf_index(vecs, args.append_index, id_col=idx_id,
                                vec_col=idx_vec)
        print(f"appended: {n} rows -> {args.append_index}")
        return 0

    if args.compact_index:
        from cloudbrush_spark.operators.similarity import compact_index
        n = compact_index(spark, args.compact_index,
                          repair=args.compact_repair)
        print(f"compacted index: {n} files before -> {args.compact_index}")
        return 0

    if args.split_index:
        from cloudbrush_spark.operators.similarity import split_fat_buckets
        s = split_fat_buckets(spark, args.split_index,
                              skew_threshold=args.skew_threshold,
                              repair=args.split_repair)
        print(json.dumps(s))
        return 0

    if args.merge_index:
        from cloudbrush_spark.operators.similarity import \
            merge_small_buckets
        st = 4.0 if args.small_threshold is None else args.small_threshold
        s = merge_small_buckets(spark, args.merge_index,
                                small_threshold=st,
                                k_floor=args.k_floor,
                                repair=args.merge_repair)
        print(json.dumps(s))
        return 0

    if args.rebalance_index:
        from cloudbrush_spark.operators.similarity import rebalance_index
        st = 8.0 if args.small_threshold is None else args.small_threshold
        s = rebalance_index(spark, args.rebalance_index,
                            skew_threshold=args.skew_threshold,
                            small_threshold=st)
        print(json.dumps(s))
        return 0

    if args.maintain_index:
        from cloudbrush_spark.operators.similarity import maintain_index
        st = 8.0 if args.small_threshold is None else args.small_threshold
        s = maintain_index(spark, args.maintain_index,
                           skew_threshold=args.skew_threshold,
                           small_threshold=st)
        print(json.dumps(s))
        return 0

    if args.delete_index or args.undelete_index:
        from cloudbrush_spark.operators.similarity import (
            delete_from_ivf_index, undelete_from_ivf_index)
        if not args.ids:
            raise SystemExit(
                "-delete_index/-undelete_index require -ids "
                "(comma-separated list or a parquet path)")
        # a path that exists (or names parquet, or carries a filesystem
        # scheme — hdfs://, s3a://: driver-local os.path.exists sees
        # none of those) is an ids table; anything else parses as a
        # comma-separated literal list — path detection first keeps
        # `-ids /gone/path` from being silently tombstoned as the
        # literal string id "/gone/path"
        if ("://" in args.ids or os.path.exists(args.ids)
                or args.ids.endswith(".parquet")):
            ids = spark.read.parquet(args.ids)
        else:
            raw = [s.strip() for s in args.ids.split(",") if s.strip()]
            try:
                ids = [int(s) for s in raw]
            except ValueError:
                ids = raw
        if args.delete_index:
            n = delete_from_ivf_index(spark, args.delete_index, ids)
            print(json.dumps({"tombstoned": n}))
        else:
            n = undelete_from_ivf_index(spark, args.undelete_index, ids)
            print(json.dumps({"lifted": n}))
        return 0

    if args.index_stats:
        from cloudbrush_spark.operators.similarity import index_stats
        print(json.dumps(index_stats(spark, args.index_stats)))
        return 0

    if args.compact:
        if not args.out:
            raise SystemExit("-compact requires -out DIR")
        from cloudbrush_spark.sources.corpus import compact_batches
        n = compact_batches(spark, args.compact, args.out,
                            files=args.files_per_split)
        print(f"compacted: {n} batches -> {args.out}")
        return 0

    if args.curate:
        if not args.out:
            raise SystemExit("-curate requires -out DIR")
        from pyspark.sql import functions as F

        from cloudbrush_spark.pipeline.curation import curate
        from cloudbrush_spark.sources.corpus import publish_corpus
        if args.input_format == "parquet":
            docs = spark.read.parquet(args.curate)
        else:
            from cloudbrush_spark.sources import textfiles
            reader = (textfiles.read_jsonl if args.input_format == "jsonl"
                      else textfiles.read_csv_quoted)
            docs = reader(spark, args.curate, args.input_schema)
        bench = (spark.read.parquet(args.benchmark)
                 if args.benchmark else None)
        if args.bench_embeddings and not args.embeddings:
            raise SystemExit("-bench_embeddings requires -embeddings")
        if (args.prior_embeddings or args.prior_index
                or args.write_index) and not args.embeddings:
            raise SystemExit("-prior_embeddings/-prior_index/-write_index "
                             "requires -embeddings (the current corpus's "
                             "vectors)")
        if args.prior_embeddings and args.prior_index:
            raise SystemExit("-prior_embeddings and -prior_index are "
                             "mutually exclusive forms of the same gate")
        if args.embeddings and not (args.bench_embeddings
                                    or args.prior_embeddings
                                    or args.prior_index
                                    or args.write_index):
            raise SystemExit(
                "-embeddings needs -bench_embeddings (semantic "
                "decontamination), -prior_embeddings/-prior_index "
                "(cross-release embedding dedup) and/or -write_index")
        sem_kw = {}
        if args.bench_embeddings:
            sem_kw = dict(
                benchmark_vectors=spark.read.parquet(args.bench_embeddings),
                corpus_vectors=spark.read.parquet(args.embeddings),
                semantic_threshold=args.semantic_threshold)
        if args.prior:
            sem_kw["reference_docs"] = spark.read.parquet(args.prior)
        if (args.mixture is not None or args.budget is not None
                or args.token_budget is not None
                or args.src_budget is not None
                or args.bucket_width is not None
                or args.prev_release is not None
                or args.prior_embeddings is not None
                or args.prior_index is not None
                or args.write_index
                or args.dsir_target is not None):
            from cloudbrush_spark.pipeline.release import (
                ReleasePipeline, incremental_release)
            weights = json.loads(args.mixture) if args.mixture else None
            src_budgets = (json.loads(args.src_budget)
                           if args.src_budget else None)
            rel_kw = dict(
                mixture_weights=weights, budget=args.budget,
                token_budget=args.token_budget,
                source_token_budgets=src_budgets,
                report=args.report, audit_spans=args.audit_spans,
                files_per_split=args.files_per_split, benchmark=bench,
                quality_min=args.quality_min, lang=args.lang,
                min_tokens=args.min_tokens, max_tokens=args.max_tokens,
                decontam_n=args.decontam_n, **sem_kw)
            extra_info: dict = {}
            if args.bucket_width is not None:
                rel_kw["bucketed_publish"] = True
                rel_kw["publish_bucket_width"] = args.bucket_width
            if args.prior_embeddings or args.prior_index or args.write_index:
                def _dvec(path):
                    df = spark.read.parquet(path)
                    if "doc_id" not in df.columns and "vec_id" in df.columns:
                        df = df.withColumnRenamed("vec_id", "doc_id")
                    return df.select(
                        "doc_id",
                        F.transform("embedding",
                                    lambda x: x.cast("double"))
                        .alias("embedding"))
                rel_kw["embeddings"] = _dvec(args.embeddings)
                if args.prior_index:
                    rel_kw["prior_index_path"] = args.prior_index
                    rel_kw["prior_index_nprobe"] = args.prior_index_nprobe
                elif args.prior_embeddings:
                    rel_kw["prior_embeddings"] = _dvec(args.prior_embeddings)
                rel_kw["embedding_threshold"] = args.emb_dedup_threshold
                if args.write_index:
                    rel_kw["write_index"] = True
            if args.dsir_target:
                rel_kw["dsir_target"] = spark.read.parquet(args.dsir_target)
            if args.prev_release and not args.base:
                # without -base there is no delta to bound the rewrite,
                # so the publish would silently fall back to a full
                # from-scratch release — refuse instead of surprising
                raise SystemExit(
                    "-prev_release requires -base (and -prev_features): "
                    "an incremental publish needs the previous snapshot "
                    "to compute the delta; without it the run would be "
                    "a full republish, not what you asked for.")
            if args.base:
                prev = (spark.read.parquet(args.prev_features)
                        if args.prev_features else None)
                rel = incremental_release(
                    spark, spark.read.parquet(args.base), docs, args.out,
                    prev_features=prev, checkpoint_dir=args.ckpt,
                    prev_release_path=args.prev_release,
                    verbose=True, boilerplate_max_df=args.boiler_df,
                    scrub_spans_min_df=args.scrub_spans_df, **rel_kw)
                delta = spark.read.parquet(
                    os.path.join(args.out, "delta.parquet"))
                extra_info["delta"] = {
                    r.action: r.n for r in delta.groupBy("action")
                    .agg(F.count(F.lit(1)).alias("n")).collect()}
            else:
                pipe = ReleasePipeline(spark, checkpoint_dir=args.ckpt,
                                       verbose=True)
                rel = pipe.run(
                    docs, args.out, boilerplate_max_df=args.boiler_df,
                    scrub_spans_min_df=args.scrub_spans_df,
                    cache_features=args.cache_features, **rel_kw)
                extra_info["stages"] = pipe.counters
            counts = {r.split: r.n for r in rel.groupBy("split")
                      .agg(F.count(F.lit(1)).alias("n")).collect()}
            n_shards = rel.agg(F.count_distinct("shard_id").alias("n")) \
                .collect()[0].n
            print("released:", json.dumps(
                {"splits": counts, "shards": n_shards, **extra_info},
                sort_keys=True))
            return 0
        if args.boiler_df is not None:
            # plain-curate path: scrub the corpus itself so the
            # published text (not just the gate) is boilerplate-free —
            # same contract as the release chain's stage 0
            from cloudbrush_spark.operators.guard import boilerplate_scrub
            cleaned = boilerplate_scrub(docs, max_df=args.boiler_df)
            other = [c for c in docs.columns if c != "text"]
            docs = docs.select(*other).join(
                cleaned.select("doc_id",
                               F.col("clean_text").alias("text")),
                "doc_id")
        if args.scrub_spans_df is not None:
            # same pre-curate placement as the release chain's stage 0b
            from cloudbrush_spark.operators.guard import span_scrub
            cleaned = span_scrub(docs, min_df=args.scrub_spans_df)
            other = [c for c in docs.columns if c != "text"]
            docs = docs.select(*other).join(
                cleaned.select("doc_id",
                               F.col("clean_text").alias("text")),
                "doc_id")
        manifest = curate(
            docs, quality_min=args.quality_min, lang=args.lang,
            min_tokens=args.min_tokens, max_tokens=args.max_tokens,
            benchmark=bench, decontam_n=args.decontam_n, **sem_kw)
        # manifest lands beside the corpus: the audit record of what was
        # kept and why (features + split), re-joinable by doc_id
        manifest.write.mode("overwrite").parquet(
            os.path.join(args.out, "manifest.parquet"))
        manifest = spark.read.parquet(os.path.join(args.out, "manifest.parquet"))
        publish_corpus(docs, manifest, os.path.join(args.out, "corpus"),
                       files_per_split=args.files_per_split)
        if args.report:
            from cloudbrush_spark.operators.report import corpus_report
            from cloudbrush_spark.sources.corpus import read_corpus
            back = read_corpus(spark, os.path.join(args.out, "corpus"))
            corpus_report(back, source_col="split").write \
                .mode("overwrite") \
                .parquet(os.path.join(args.out, "report.parquet"))
        counts = {r.split: r.n for r in manifest.groupBy("split")
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
        print("published:", json.dumps(counts, sort_keys=True))
        return 0

    if not args.reads or not args.asm:
        _build_parser().print_help()
        return 2

    from cloudbrush_spark.config import BrushParams
    from cloudbrush_spark.pipeline.assembler import Assembler
    from cloudbrush_spark.sources.fasta import read_fastq, read_sfa, write_fasta

    if args.reads.endswith((".fastq", ".fq")):
        reads = read_fastq(spark, args.reads)
    else:
        reads = read_sfa(spark, args.reads)
    params = BrushParams(
        k=args.k, readlen=args.readlen, up_kmer=args.kmerup,
        low_kmer=args.kmerlow, kmer_cov=args.kmercov,
        bubble_edit_rate=args.bubbleerate, majority=args.maj,
        pwm_n=args.pwm_n, low_cov_thresh=args.lowcov,
        serial_threshold=args.nodes, precorrect=args.precorrect,
    )
    asm = Assembler(spark, params=params, verbose=True,
                    checkpoint_dir=args.ckpt)
    nodes, edges = asm.assemble(reads)
    os.makedirs(args.asm, exist_ok=True)
    nodes.write.mode("overwrite").parquet(os.path.join(args.asm, "nodes.parquet"))
    edges.write.mode("overwrite").parquet(os.path.join(args.asm, "edges.parquet"))
    final_nodes = spark.read.parquet(os.path.join(args.asm, "nodes.parquet"))
    write_fasta(final_nodes, os.path.join(args.asm, "contigs.fa"))
    print("counters:", json.dumps(asm.counters))
    _print_stats(asm.stats_report(final_nodes, genome_size=args.genome))
    return 0


if __name__ == "__main__":
    sys.exit(main())
