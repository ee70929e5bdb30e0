from sqlserver_cdc_to_kafka_spark.fixtures.cdc_events import (  # noqa: F401
    CDC_EVENTS_SQL,
    CDC_LINEITEM_SQL,
    cdc_events,
    cdc_lineitem_events,
    with_cdc_views,
)
