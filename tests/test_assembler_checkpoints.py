"""Durable stage checkpointing: a finished stage loads instead of
recomputing on the next run (reference runStage/checkDone parity)."""

import random

from cloudbrush_spark.config import BrushParams
from cloudbrush_spark.pipeline.assembler import Assembler


def _reads(spark):
    rng = random.Random(21)
    genome = "".join(rng.choice("ACGT") for _ in range(300))
    rows = [(f"r{i:02d}", genome[i * 5:i * 5 + 40]) for i in range(53)
            if len(genome[i * 5:i * 5 + 40]) == 40]
    return spark.createDataFrame(rows, "read_id string, seq string")


def test_assemble_resumes_from_stage_checkpoints(spark, tmp_path):
    reads = _reads(spark)
    params = BrushParams(k=15, readlen=40)
    asm1 = Assembler(spark, params, checkpoint_dir=str(tmp_path))
    n1, _ = asm1.assemble(reads)
    first = sorted(r.seq for r in n1.collect())
    assert not any(k.startswith("loaded_") for k in asm1.counters)

    asm2 = Assembler(spark, params, checkpoint_dir=str(tmp_path))
    n2, _ = asm2.assemble(reads)
    second = sorted(r.seq for r in n2.collect())
    # every stage was loaded, none recomputed; results identical
    for stage in ("01_string_graph", "02_notips", "03_nobubbles",
                  "04_lowcov", "05_edgeadjust"):
        assert asm2.counters.get(f"loaded_{stage}") == 1
    assert "nodes" not in asm2.counters      # preprocess never ran
    assert first == second
