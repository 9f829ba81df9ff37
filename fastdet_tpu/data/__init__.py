"""Procedural datasets for training and stress-testing the detector.

The reference ships three static photos and no training data at all
(/root/reference/testdata, README.md:36-50); its 9-class RSU model was
trained outside the repo. This package generates labeled scenes with
exact ground truth so the framework's training subsystem can be proven
end-to-end without any external download.
"""

from fastdet_tpu.data.synth import (  # noqa: F401
    SHAPE_CLASSES,
    make_scene,
    make_dataset,
)
