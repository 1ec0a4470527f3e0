"""Flax model zoo covering every model family in the reference.

Reference inventory (SURVEY.md section 2.1):

- ``SiameseHead``       — feature-pair verification head
  (code/siamese.py:19-35, L1 distance -> 512 -> 64 -> 2 softmax), plus the
  py3 sigmoid variant (code/siamese3.py, Dense(1) + sigmoid).
- ``SmallRes``          — twin-tower conv siamese for low-res faces
  (code/siamese.py:134-170).
- ``VGGFaceResNet50``   — 2048-d featurizer (code/siamese.py:203-216 via
  keras_vggface resnet50, avg_pool output).
- ``VGGFace16``         — 25088-d pool5 featurizer (code/siamese.py:187-200).
- ``ArcFaceResNet100``  — LResNet100E-II 512-d L2-normalised embedder
  (code/face_model.py:28-41,86-93).
- ``PNet/RNet/ONet/LNet`` — the MTCNN cascade (code/mtcnn_detector.py:52-65).

All models are functional flax modules: params are explicit pytrees, so the
committee can stack them on a leading ensemble axis and ``vmap`` the apply
(replacing the Python model loop at code/committee.py:15-16).
"""

from alink_tpu.models.siamese import SiameseHead, SmallRes, SmallResTower  # noqa: F401
from alink_tpu.models.resnet import (  # noqa: F401
    SENet50,
    VGGFace16,
    VGGFaceResNet50,
    stack_bottleneck_params,
    unstack_bottleneck_params,
)
from alink_tpu.models.arcface import (  # noqa: F401
    ArcFaceResNet34,
    ArcFaceResNet50,
    ArcFaceResNet100,
    stack_ir_params,
    unstack_ir_params,
)
from alink_tpu.models.mtcnn import PNet, RNet, ONet, LNet  # noqa: F401
from alink_tpu.models.classify import (  # noqa: F401
    ResNet50Classifier,
    SENet50Classifier,
    SmallResClassifier,
    VGG16Classifier,
)
from alink_tpu.models import preprocess  # noqa: F401
