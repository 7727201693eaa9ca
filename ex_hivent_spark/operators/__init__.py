"""ex_hivent_spark.operators subpackage."""
