from sqlserver_cdc_to_kafka_spark.model.change_index import (  # noqa: F401
    CHANGE_INDEX_FIELDS,
    CHANGE_INDEX_TYPE,
    HIGHEST_CHANGE_INDEX,
    LOWEST_CHANGE_INDEX,
    change_index_col,
    change_index_from_seq,
    change_index_hex,
    change_index_literal,
    is_probably_heartbeat,
)
from sqlserver_cdc_to_kafka_spark.model.envelope import (  # noqa: F401
    ENVELOPE_COLS,
    OPERATIONS,
    OP_DELETE,
    OP_INSERT,
    OP_POST_UPDATE,
    OP_PRE_UPDATE,
    OP_SNAPSHOT,
    envelope_schema,
)
from sqlserver_cdc_to_kafka_spark.model.types import spark_type_for_sql_server  # noqa: F401
