from etly_spark.sources.storage import (  # noqa: F401
    list_source_objects,
    read_records,
)
from etly_spark.sources.datastore import read_datastore  # noqa: F401
