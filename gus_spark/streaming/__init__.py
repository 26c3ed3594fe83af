from gus_spark.streaming.curation import curate_stream  # noqa: F401
from gus_spark.streaming.decontaminate import decontaminate_stream  # noqa: F401
from gus_spark.streaming.stateful import (  # noqa: F401
    per_key_quota_stream,
    running_user_totals,
)
from gus_spark.streaming.neardup import (  # noqa: F401
    minhash_tombstone_stream,
    neardup_stream,
)
from gus_spark.streaming.packing import pack_stream  # noqa: F401
from gus_spark.streaming.pipeline import CurationPipelineStream  # noqa: F401
from gus_spark.streaming.urldedup import url_dedup_stream  # noqa: F401
from gus_spark.streaming.vectors import (  # noqa: F401
    vector_index_stream,
    vector_tombstone_stream,
)
from gus_spark.streaming.subscriptions import (  # noqa: F401
    attribution_join,
    click_purchase_attribution,
    dedup_stream,
    run_to_memory,
    session_aggregates,
    stream_events,
    windowed_rollup,
)
