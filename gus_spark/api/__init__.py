from gus_spark.api.graphql import GraphQLApi, generate_sdl  # noqa: F401
from gus_spark.api.rest import RestApi  # noqa: F401
