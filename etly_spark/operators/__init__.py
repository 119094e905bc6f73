from etly_spark.operators.multimodal import (  # noqa: F401
    DECODED_SCHEMA,
    attach_binary_payload,
    decode_features,
)
