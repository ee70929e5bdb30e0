"""Declared queries (driver contract). Importing this package registers every
query with the registry."""

# Registration order matters if a driver caps how many queries it checks per
# round: modules that have never had a driver correctness row (validation,
# scans, pipeline text/training ops) register FIRST so they get checked before
# any budget runs out; the modules with prior green rows register last.
from sqlserver_cdc_to_kafka_spark.queries import validation  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import scans  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import pipeline2  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import pipeline3  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import pipeline4  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import pipeline5  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import behavior  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import graph  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import pipeline  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import audit  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import analytics  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import olap2  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import cdc  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import event_windows  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import functions  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import joins  # noqa: F401
# pipeline6 registers LAST: its round-6-continuation queries are the newest,
# so in the never-driver-checked tier (ties broken by registration order)
# they queue BEHIND queries that have been waiting since earlier sessions.
from sqlserver_cdc_to_kafka_spark.queries import pipeline6  # noqa: F401
