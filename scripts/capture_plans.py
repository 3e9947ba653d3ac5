"""Capture .explain('formatted') for every bench headline query.

Usage: python scripts/capture_plans.py <outdir> [query,query,...]

Writes <outdir>/<query>.txt with the formatted physical plan (the
pre-execution AQE plan — the shape the optimization guide's checklist
reads: Exchange count, join strategy, PushedFilters/ReadSchema,
BatchEvalPython nodes).  Used to commit plans/r14/<q>_before.txt /
_after.txt evidence.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
import bench  # noqa: E402
from cloudbrush_spark.session import get_spark  # noqa: E402


def resolve_queries():
    qs = entrymod.queries()
    for name in bench.HEADLINE:
        if name not in qs and hasattr(entrymod, f"q_{name}"):
            qs[name] = getattr(entrymod, f"q_{name}")
    qs["minhash_lsh_dedup"] = entrymod.q_minhash_pairs_self
    qs["shard_pack"] = entrymod.q_shard_pack_only
    qs["budget_select"] = entrymod.q_budget_select_only
    qs["corpus_report"] = entrymod.q_corpus_report_only
    qs["json_props_agg"] = entrymod.q_probe_json_agg
    qs["heavy_tokens"] = entrymod.q_probe_heavy_tokens
    qs["corpus_guard"] = entrymod.q_corpus_guard_base
    qs["repeated_spans"] = entrymod.q_repeated_spans_only
    qs["pack_sequences"] = entrymod.q_pack_sequences_only
    qs["span_scrub"] = entrymod.q_span_scrub_only
    qs["bm25"] = entrymod.q_bm25_only
    qs["ann_ivfq"] = entrymod.q_ann_ivfq_only
    return qs


def main() -> None:
    outdir = sys.argv[1]
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("cloudbrush-plans")
    qs = resolve_queries()
    names = only or bench.HEADLINE
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        stdout, sys.stdout = sys.stdout, buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"# wrote {name} ({len(buf.getvalue())} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
