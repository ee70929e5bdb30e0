"""Declared queries (driver contract). Importing this package registers every
query with the registry."""

from sqlserver_cdc_to_kafka_spark.queries import analytics  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import audit  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import cdc  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import event_windows  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import functions  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import joins  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import pipeline  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import pipeline2  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import scans  # noqa: F401
from sqlserver_cdc_to_kafka_spark.queries import validation  # noqa: F401
