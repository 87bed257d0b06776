"""LLM-data-pipeline extension layer: multimodal column plumbing lives here;
dedup/similarity/text operators are registered in
``lakehouse_workshop_spark.operators.llm_*``."""
