"""Framework utilities: profiling, metrics logging, misc helpers.

The reference has no tracing, no metrics beyond prints, and a grab-bag
``code/helpers.py`` (SURVEY.md section 5).  Here:

- ``profiling`` — per-phase wall-clock timing + ``jax.profiler`` trace
  capture (greenfield; the reference's only observability is tqdm bars);
- ``metrics``   — structured JSONL metrics logging;
- ``resilience``— failure detection + retry/elastic recovery (section
  5.3): ``run_with_retries`` supervision, shared-fs ``Heartbeat`` peer
  liveness, deadline ``barrier``;
- ``helpers``   — the label utilities of code/helpers.py (roundoff,
  one_hot, unisonSplit, calculate_accuracy, confusion matrix).
"""

from alink_tpu.utils.profiling import Timings, trace  # noqa: F401
from alink_tpu.utils.metrics import MetricsLogger  # noqa: F401
from alink_tpu.utils.resilience import (  # noqa: F401
    Heartbeat,
    PeerFailure,
    RetryReport,
    barrier,
    run_with_retries,
)
from alink_tpu.utils.helpers import (  # noqa: F401
    calculate_accuracy,
    confusion_counts,
    one_hot,
    roundoff,
    unison_split,
)
