"""Native (C++) runtime components, built on demand with g++.

Currently: the iso-surface extractor (native/isosurface.cpp) used by mesh
extraction (reference capability: eval/eval.py:90-110, src/util/recon.py).
"""

from pixelnerf_tpu.native.build import load_isosurface  # noqa: F401
