"""ex_hivent_spark.functions subpackage."""
