"""LLM-data-pipeline query registrations (dedup, similarity, text
analysis) over documents/embeddings. Filled by csv_query_engine_spark.pipeline.
"""

# Registrations are added in later milestones; importing this module must
# stay cheap (no Spark session creation at import time).
