"""Entry-point drivers (the reference's L7 layer).

Reference: ``code/ALINK.py``, ``code/ALINK_arc.py``, ``code/ALINK_MTP.py``,
``code/existing_al.py``, ``code/visualize_noise.py`` — TF-flag CLIs run as
``python ALINK.py --flag=...``.  Each driver here exposes the same knobs
(argparse, names 1:1 with the reference flags — see config.py) plus a
composable ``run_*`` function so the same pipeline is scriptable without a
shell.

- ``alink``           — A-LINK/A2-LINK on DFW, VGGFace-ResNet50 2048-d
  teacher features at 224x224 (ALINK.py).
- ``alink_arc``       — the ArcFace configuration: 112x112, 512-d
  L2-normalised embeddings, perlin added to the default noise bank
  (ALINK_arc.py:41).
- ``alink_mtp``       — Multi-PIE cross-resolution variant with the
  in-driver gallery top-1 evaluation (ALINK_MTP.py).
- ``existing_al``     — classical uncertainty/margin/entropy AL baseline
  (existing_al.py).
- ``visualize_noise`` — render a noise channel to an image file
  (visualize_noise.py).
"""
