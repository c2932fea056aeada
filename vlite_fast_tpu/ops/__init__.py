from vlite_fast_tpu.ops import (  # noqa: F401
    unpack,
    kurtosis,
    normalize,
    channelize,
    quantize,
    injection,
    coherent,
    dedisperse,
    pallas_kernels,
)
