"""ex_hivent_spark.llm subpackage."""
