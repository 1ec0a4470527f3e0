"""Data layer: manifests, fixed-shape loading, index-space pair sampling.

Reference: ``code/readDFW.py`` / ``code/readMTP.py`` — Python-list pipelines
that materialise every pair combination on the host.  The TPU rebuild keeps
the same dataset *protocols* but re-architects the representation:

- ``manifest``  — host-side dataset scans (DFW ``_h_``/``_I_`` filename
  protocol, Multi-PIE session filters), no pixels touched;
- ``loader``    — decode + resize into **person-padded device arrays**
  ``(P, S_max, ...)`` with per-person counts, the masked-ragged discipline
  everything downstream assumes (SURVEY.md section 7, hard part (d));
- ``pairs``     — pair generation as index-space computation: balanced
  samplers and all-pairs grids produce (person, image) index arrays; pixels
  or features are gathered on device only when a batch is consumed;
- ``synth``     — synthetic DFW/MTP-shaped fixture datasets for tests.
"""

from alink_tpu.data.manifest import (  # noqa: F401
    DFWPerson,
    lookup_file,
    mtp_qualifies,
    scan_dfw,
    scan_mtp,
)
from alink_tpu.data.loader import PersonStacks, load_person_stacks  # noqa: F401
from alink_tpu.data.pairs import (  # noqa: F401
    all_pairs_index,
    all_pairs_minibatch,
    balanced_pair_batches,
    gather_pairs,
    mtp_all_pairs_index,
    mtp_all_pairs_minibatch,
    split_disguise_data,
)
from alink_tpu.data.synth import (make_synthetic_dfw,  # noqa: F401
    make_synthetic_dfw_test, make_synthetic_mtp)
from alink_tpu.data.prefetch import (  # noqa: F401
    DevicePrefetcher,
    prefetch_to_device,
)
