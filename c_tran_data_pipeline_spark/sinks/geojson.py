"""K6: GeoJSON output (reference tsvscript.py:46-60).

The reference assembles Feature dicts driver-side from fetchall() rows.
Here feature construction is a Column expression (to_json over structs) so
it scales with the data — only the final FeatureCollection wrapper, which
is inherently a single document, touches the driver. For large results,
``write_feature_files`` emits JSON-lines of Features (the scalable cousin:
splittable, no global wrapper)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def feature_column(lon: Column, lat: Column, properties: dict[str, Column]) -> Column:
    """GeoJSON Feature(Point(lon,lat), properties) as a JSON string column
    (matches the reference's geojson.Feature shape, tsvscript.py:49-54)."""
    return F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct(
                F.lit("Point").alias("type"),
                F.array(lon.cast("double"), lat.cast("double")).alias("coordinates"),
            ).alias("geometry"),
            F.struct(*[c.alias(k) for k, c in properties.items()]).alias("properties"),
        )
    )


def features_df(df: DataFrame, lon: str, lat: str, property_cols: list[str]) -> DataFrame:
    return df.select(
        feature_column(F.col(lon), F.col(lat), {c: F.col(c) for c in property_cols}).alias("feature")
    )


def write_feature_files(df: DataFrame, lon: str, lat: str, property_cols: list[str], path: str) -> None:
    """Scalable sink: one Feature per line across N part files."""
    features_df(df, lon, lat, property_cols).write.mode("overwrite").text(path)


def feature_collection(df: DataFrame, lon: str, lat: str, property_cols: list[str]) -> str:
    """Small-result sink: the exact FeatureCollection document the
    reference writes (tsvscript.py:58-60). Collects — caller guarantees
    the result is driver-sized (the flagship query returns ~10² rows)."""
    feats = [r.feature for r in features_df(df, lon, lat, property_cols).collect()]
    return '{"type": "FeatureCollection", "features": [' + ", ".join(feats) + "]}"
