"""Contraction-loop scale probe: one long compressible chain of N nodes
through ``contract_chains`` (G4 link detect -> G5/G6 randomized pairwise
rounds -> G7/G8 serial finish), fresh session per leg.

SURVEY §4's #1 hazard is the iterative composite: rounds must stay
O(log chain) (randomized mating merges a constant expected fraction per
round; the serial switch collapses the sub-threshold tail in one driver
pass), and wall per round must stay linear in the surviving graph.  The
chain topology is the WORST case for the loop — every node is
compressible, so round 1 processes the whole graph and the loop runs its
full depth (the Ec10k golden graph bottoms out in 2-3 rounds).

Node payloads are minimal (2-char seqs, ov=1): the probe times the LOOP
(degree join, coin matching, edge rewrite, checkpoint cadence), not
string splicing — the merged sequence still grows to ~N chars, so the
splice cost is present but not dominant, matching a real assembly where
sequence bytes ride along the contraction.

  python scripts/probe_contraction.py 150000     # x10 of sf0.1's node count
  python scripts/probe_contraction.py 1500000    # x100

Prints one JSON line: {probe, n_nodes, rounds, wall_sec, final_nodes,
final_edges, host_parallel_sec, host_single_sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cloudbrush_spark.operators.contraction import contract_chains  # noqa: E402
from cloudbrush_spark.session import get_spark, host_parallel_probe  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    spark = get_spark("contract-probe")
    par, single = host_parallel_probe(spark)
    nodes = spark.range(n).select(
        F.concat(F.lit("n"), F.col("id")).alias("node_id"),
        F.lit("AC").alias("seq"), F.lit(1.0).alias("cov"))
    # symmetrized like the real pipeline's post-J3 graph (forward link +
    # its GenReverseEdge mirror) — compressible()'s handshake needs the
    # back side's degree
    fwd = spark.range(n - 1).select(
        F.concat(F.lit("n"), F.col("id")).alias("src"),
        F.lit("ff").alias("et"),
        F.concat(F.lit("n"), F.col("id") + 1).alias("dst"),
        F.lit(1).alias("ov"))
    rev = spark.range(n - 1).select(
        F.concat(F.lit("n"), F.col("id") + 1).alias("src"),
        F.lit("rr").alias("et"),
        F.concat(F.lit("n"), F.col("id")).alias("dst"),
        F.lit(1).alias("ov"))
    edges = fwd.unionByName(rev)
    nodes = nodes.localCheckpoint(eager=True)
    edges = edges.localCheckpoint(eager=True)
    t0 = time.time()
    n2, e2, rounds = contract_chains(nodes, edges, verbose=True)
    wall = time.time() - t0
    print(json.dumps({
        "probe": "contraction_chain", "n_nodes": n, "rounds": rounds,
        "wall_sec": round(wall, 1), "final_nodes": n2.count(),
        "final_edges": e2.count(),
        "host_parallel_sec": round(par, 2),
        "host_single_sec": round(single, 2),
    }))


if __name__ == "__main__":
    main()
