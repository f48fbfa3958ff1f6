"""bench.py --sf-scale-check builder: the 10× slice must multiply fact
ROWS and KEY CARDINALITIES (facts grow, dims fixed) — a plain self-union
would multiply duplicity instead and silently change every query's
complexity class."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from bench import _build_scaled_dir
from tests.conftest import SF_SMOKE


def test_scaled_dir_multiplies_rows_and_cardinalities(spark):
    out = tempfile.mkdtemp(prefix="sfx_test_")
    try:
        _build_scaled_dir(spark, SF_SMOKE, out, factor=3)
        from avocado_spark.session import load_table

        for name in ("lineitem", "events", "documents", "orders", "embeddings"):
            base = load_table(spark, SF_SMOKE, name)
            scaled = load_table(spark, out, name)
            assert scaled.count() == 3 * base.count(), name
        # dims copied, not multiplied
        assert (
            load_table(spark, out, "region").count()
            == load_table(spark, SF_SMOKE, "region").count()
        )
        # key shifting: cardinality grows with the rows
        ev0 = load_table(spark, SF_SMOKE, "events")
        ev3 = load_table(spark, out, "events")
        assert (
            ev3.select(F.countDistinct("user_id")).first()[0]
            == 3 * ev0.select(F.countDistinct("user_id")).first()[0]
        )
        assert (
            ev3.select(F.countDistinct("event_id")).first()[0] == ev3.count()
        )
        # replica documents are near-dups, not byte-identical
        d3 = load_table(spark, out, "documents")
        assert (
            d3.select(F.countDistinct("text")).first()[0] == d3.count()
            or d3.select(F.countDistinct("text")).first()[0]
            > load_table(spark, SF_SMOKE, "documents").count()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
