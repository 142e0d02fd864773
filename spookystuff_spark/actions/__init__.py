from spookystuff_spark.actions.core import (  # noqa: F401
    NO_OP,
    Action,
    Named,
    Trace,
    TraceSet,
    action_from_dict,
    as_trace,
    as_trace_set,
    register_action,
    trace_from_json,
)
from spookystuff_spark.actions.control import (  # noqa: F401
    Delay,
    LocalRetry,
    Loop,
    RandomDelay,
    Wayback,
)
from spookystuff_spark.actions.export import Accept, ValidationError  # noqa: F401
from spookystuff_spark.actions.http import OAuthV2, Wget, Wpost  # noqa: F401
from spookystuff_spark.actions.mock import Mock  # noqa: F401
from spookystuff_spark.actions.runtime import Agent, fetch_trace  # noqa: F401
