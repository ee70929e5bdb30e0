from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (  # noqa: F401
    clock_skew_adjust,
    epoch_micros,
    epoch_seconds,
    int_div,
)
from sqlserver_cdc_to_kafka_spark.functions.lsn import lsn_hex, lsn_hex_decode  # noqa: F401
from sqlserver_cdc_to_kafka_spark.functions.masks import update_mask_to_fields  # noqa: F401
from sqlserver_cdc_to_kafka_spark.functions.row_hash import synthetic_row_hash  # noqa: F401
from sqlserver_cdc_to_kafka_spark.functions.truncation import utf8_truncate  # noqa: F401
from sqlserver_cdc_to_kafka_spark.functions.uuids import sql_server_uuid_sort_key  # noqa: F401
