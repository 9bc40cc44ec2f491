"""ionex_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the computational core of the reference IONEX library
(/root/reference, Rust) as an idiomatic Spark engine:

- quantized lat/lon/alt/time grid data model (reference src/quantized.rs,
  src/record/mod.rs) → columnar ``tec_points`` / ``tec_cells`` DataFrames,
- grid-cell lookup + bilinear spatial interpolation (src/cell/mod.rs:412-432)
  → O(1) arithmetic cell index + broadcast equi-join + JVM column expressions,
- time-bracketed temporal interpolation (src/cell/mod.rs:799-830)
  → arithmetic epoch bracketing + weighted combine,
- generalized into H3/S2-style hierarchical cell encoding, point-in-polygon
  joins, kNN lookup, and raster<->vector tile assignment over image+caption
  tables, plus large-scale training-data ops (dedup, similarity search,
  text analysis, multimodal plumbing).

No code is copied from the reference; its documented formulas and golden
test fixtures are the behavioral contract (see SURVEY.md / FIXTURES.md).
"""

__version__ = "0.1.0"
