"""segmentron_tpu: a TPU-native semantic-segmentation framework in JAX.

A ground-up rebuild of the capabilities of LikeLy-Journey/SegmenTron
(config-driven model zoo, Trainer/Evaluator engine, multi-scale +
sliding-window eval, confusion-matrix mIoU) designed for TPU: functional
flax models in NHWC, a single jitted train step sharded over an ICI
device mesh, cross-replica psum BatchNorm, exact align-corners resize,
and Pallas kernels for the hot blocks.
"""

__version__ = "0.1.0"
