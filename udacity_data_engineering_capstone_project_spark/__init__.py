"""PySpark-native analytics engine.

A brand-new, idiomatic PySpark re-expression of the query and
data-processing capabilities of the reference ETL/star-schema project
(``qusay-elewy/udacity_data_engineering_capstone_project``, surveyed in
``SURVEY.md``), plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing,
streaming) the reference lacks.

Layout:
    session     SparkSession factory (AQE on, UTC, tuned shuffle)
    sources     readers (parquet/CSV/in-memory/SAS-label parser) + writers
    functions   column-expression helpers (dates, seasons, hashing, text, vectors)
    operators   composable DataFrame operators (cleaning, joins, aggregates,
                sets, sorting, windows, dedup, similarity, textops, multimodal)
    plans       star-schema model builders, the acceptance-query workload,
                data-quality checks
    streaming   Structured Streaming surface over the events table

Everything is DataFrame-first: operators build lazy plans and let
Catalyst/Tungsten pick physical strategies; Python UDFs appear only in
the multimodal slow path (Arrow-batched ``mapInPandas``).
"""

__version__ = "0.1.0"
