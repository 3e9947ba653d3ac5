import pytest


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from cloudbrush_spark.session import get_spark
    s = get_spark("cloudbrush-tests", extra_conf={
        "spark.sql.shuffle.partitions": "8",
        # managed-table tests (bucketing) must not write into the repo
        "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="cb-warehouse-"),
    })
    yield s


def make_nodes(spark, rows):
    """rows: [(node_id, seq, cov)]"""
    return spark.createDataFrame(rows, "node_id string, seq string, cov double")


def make_edges(spark, rows):
    """rows: [(src, et, dst, ov)]"""
    return spark.createDataFrame(rows, "src string, et string, dst string, ov int")
