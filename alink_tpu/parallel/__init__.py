"""Device-mesh construction and sharding helpers.

The reference has no parallelism of any kind: one TF session on one GPU
(``code/ALINK.py:22-25``), one MXNet context at batch=1
(``code/face_model.py:39,46``), and a commented-out multiprocessing pool
(``code/mtcnn_detector.py:61``).  Everything here is greenfield TPU design
(SURVEY.md section 2.4): a single-controller JAX mesh whose axes are

- ``data``     — batch / pair-pool sharding (DP for training & embedding,
  row-sharding for the all-pairs score matrix),
- ``model``    — committee/ensemble parallelism, column-sharding of the
  pairwise grid, and Megatron-style tensor parallelism of the ArcFace
  embedder (``tp.py``) for latency-bound serving.

Collectives ride ICI via ``psum``/``all_gather`` inserted by XLA from
sharding annotations; no NCCL/MPI analog is needed or wanted.
"""

from alink_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
)
from alink_tpu.parallel.distributed import (  # noqa: F401
    create_multihost_mesh,
    global_batch_from_local,
    initialize,
    process_shard,
)
from alink_tpu.parallel.ops import (  # noqa: F401
    sharded_committee_probs,
    sharded_face_pipeline,
    sharded_featurize,
)
from alink_tpu.parallel.tp import (  # noqa: F401
    arcface_tp_apply,
    tp_param_specs,
)
from alink_tpu.parallel.pp import arcface_pp_apply  # noqa: F401
