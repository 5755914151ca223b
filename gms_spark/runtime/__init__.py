from gms_spark.runtime.superstep import SuperstepResult, iterate  # noqa: F401
