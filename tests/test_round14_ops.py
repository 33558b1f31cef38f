"""Round-14 regression tests: ADVICE-r13 closures (torn-append-aware
plain-IVF rebalance, KLL compaction watermark, catalog-aware orphan
clearing, cosine rebalance geometry) and the round's new operators."""

import pytest
from pyspark.sql import functions as F


# ---------------- ADVICE 3: orphan clearing respects the catalog --------


def test_clear_orphaned_location_respects_catalog(spark, tmp_dir):
    """An EXTERNAL table sitting on the default warehouse path of a
    missing table name must survive (ADVICE r13 #3); a true orphan dir
    is cleared — including the default-database case, which lives at
    wh/tbl, not wh/default.db/tbl."""
    import os
    import shutil
    from urllib.parse import urlparse

    from gluestick_spark.sinks.layout import _clear_orphaned_managed_location

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    os.makedirs(wh, exist_ok=True)

    # external table whose LOCATION is the default path of name ext_prot
    ext_loc = os.path.join(wh, "ext_prot")
    shutil.rmtree(ext_loc, ignore_errors=True)
    spark.sql("DROP TABLE IF EXISTS other_name_r14")
    spark.createDataFrame([(1,)], "a int").write.mode("overwrite").parquet(
        ext_loc
    )
    spark.sql(
        f"CREATE TABLE other_name_r14 (a INT) USING parquet "
        f"LOCATION '{ext_loc}'"
    )
    try:
        assert not spark.catalog.tableExists("ext_prot")
        _clear_orphaned_managed_location(spark, "ext_prot")
        assert os.path.isdir(ext_loc), "external table data was deleted"
        assert spark.table("other_name_r14").count() == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS other_name_r14")
        shutil.rmtree(ext_loc, ignore_errors=True)

    # true orphan, QUALIFIED default-db name: old code looked at
    # wh/default.db/tbl and missed it
    orphan = os.path.join(wh, "orphan_r14")
    os.makedirs(orphan, exist_ok=True)
    _clear_orphaned_managed_location(spark, "default.orphan_r14")
    assert not os.path.isdir(orphan)

    # and the unqualified form
    os.makedirs(orphan, exist_ok=True)
    _clear_orphaned_managed_location(spark, "orphan_r14")
    assert not os.path.isdir(orphan)
