from gus_spark.model.types import ModelDefinition, validate_model_definition  # noqa: F401
from gus_spark.model.registry import ModelRegistry, parse_model_file, parse_models  # noqa: F401
from gus_spark.model.record import add_null_values, parse_record, parse_uri_id  # noqa: F401
