"""Training subsystem: jit'd steps, reference-matching schedules, checkpoints.

Reference: ``code/siamese.py:35-125``.  The Keras training stack
(``compile(loss="binary_crossentropy", optimizer=Adadelta)``, EarlyStopping /
ReduceLROnPlateau callbacks, ``train_on_batch`` with class weights) becomes:

- ``losses``     — the exact Keras loss/metric semantics as pure functions;
- ``trainer``    — TrainState + jit'd train/eval steps + host-side epoch
  control (early stop, plateau LR) + the per-batch-split custom loop;
- ``checkpoint`` — orbax-backed save/maybe-restore replacing the ``.h5``
  weight files (``siamese.py:114-125``), extended to whole train states and
  A-LINK loop state (the reference loses all mid-loop state on interruption,
  SURVEY.md section 5.4).
"""

from alink_tpu.train.losses import (  # noqa: F401
    accuracy,
    binary_crossentropy,
    class_weights_from_labels,
)
from alink_tpu.train.trainer import (  # noqa: F401
    EpochLog,
    TrainState,
    adadelta,
    create_train_state,
    custom_train,
    eval_step,
    fit,
    test_accuracy,
    train_step,
)
from alink_tpu.train.checkpoint import maybe_restore, restore, save  # noqa: F401
from alink_tpu.train.ensemble import (  # noqa: F401
    create_ensemble_state,
    ensemble_train_step,
    train_ensemble,
)
from alink_tpu.train.classifier import (  # noqa: F401
    categorical_crossentropy,
    classifier_eval_step,
    classifier_train_step,
    create_classifier_state,
    fit_classifier,
)
