"""slenderobjdet_tpu: a TPU-native (JAX/XLA/Pallas/pjit) object-detection
framework with the capabilities of SlenderObjDet (wanzysky/SlenderObjDet),
re-designed TPU-first rather than ported."""

__version__ = "0.1.0"
