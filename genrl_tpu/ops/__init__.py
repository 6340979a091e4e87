from genrl_tpu.ops.math import (
    symlog,
    symexp,
    signed_hyperbolic,
    signed_parabolic,
    lambda_return,
)
from genrl_tpu.ops import dists
from genrl_tpu.ops.streamnorm import StreamNormState, stream_norm, reward_ema
