"""Data layer: MOTFront readers/writers, detection-h5 interchange, synthetic
fixtures."""

from mot3d_tpu.data.synthetic import synthetic_sequence, SyntheticSequence
