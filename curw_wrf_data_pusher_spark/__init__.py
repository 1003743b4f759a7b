"""curw_wrf_data_pusher_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of CUrW-SL/curw_wrf_data_pusher.

The reference (at /root/reference, studied read-only) is an imperative
numpy/pandas + MySQL batch ETL pipeline for WRF weather-model rainfall
grids.  This package re-expresses every one of its dataflow operators
(SURVEY.md §2) as idiomatic Spark DataFrame plans:

- ``sources``   : NetCDF grid ingestion (S1/S2), lake/parquet scans,
                  dim-table scans (S3-S8), config read (S9).
- ``functions`` : scalar surface — timestamp decode/shift (P7), rounding
                  (P6), key construction/parsing (P8/P9), series-id
                  hashing.
- ``operators`` : adjacent-difference over time (A1/W1), latest-run dedup
                  (A6/W2), grid unpivot / source pivot (R1/R2), spatial
                  nearest-neighbour mapping (J4/W3), get-or-create dims
                  (J5), hybrid rfield assembly (J1/J2/U1/U2).
- ``plans``     : end-to-end pipelines mirroring the reference entry
                  points E1 (wrf_data_pusher), E2 (gen_rfields),
                  E3 (gen_active_stations_rfields).
- ``sinks``     : JDBC upsert with retry (K1-K3), ordered rfield file
                  emitter (K4-K6).
- ``streaming`` : Structured-Streaming view of the pipeline (§2.10).
- ``llmops``    : large-scale training-data operators beyond the
                  reference — dedup (exact/MinHash-LSH/SimHash/n-gram
                  Jaccard/embedding-cosine), ANN similarity search,
                  text analysis, multimodal column plumbing.
- ``queries``   : the registry of correctness-gated queries exposed via
                  ``__spark_entry__.py`` (each paired with a DuckDB
                  oracle).
"""

__version__ = "0.1.0"
