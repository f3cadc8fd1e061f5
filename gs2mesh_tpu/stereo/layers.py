"""Functional NN layers for the DLNR stereo net (NHWC, inference-oriented).

Parameters are nested dicts whose leaf names mirror the reference torch
modules (DLNR/core/extractor.py, nets/feature.py) so checkpoint conversion
is a mechanical name/layout map. Convs carry kernels in HWIO layout.
"""

from __future__ import annotations

import contextlib
import math

import jax
import jax.numpy as jnp
import numpy as np

f32 = jnp.float32

# Matmul-class mixed precision — the TPU analog of the reference's CUDA
# autocast (gs2mesh runs DLNR with mixed_precision=True, stereo_utils.py:55;
# torch autocast executes convs/matmuls in fp16 and everything else in
# fp32). When set to a dtype, conv/einsum OPERANDS round to it while
# accumulation and every surrounding op (norms, activations, softmax,
# bilinear sampling) stay f32. Default None: XLA's DEFAULT TPU precision
# already executes f32 convs/matmuls as single-pass bf16 on the MXU, so an
# explicit bf16 policy measures NEUTRAL on v5e (768 vs 773 ms/view) while
# adding rounding — there is nothing left to win on the matmul axis.
# Changing the value only affects subsequently TRACED functions.
MATMUL_DTYPE = None


@contextlib.contextmanager
def matmul_dtype(dtype):
    """Temporarily override the matmul-class compute dtype (None = f32)."""
    global MATMUL_DTYPE
    prev = MATMUL_DTYPE
    MATMUL_DTYPE = dtype
    try:
        yield
    finally:
        MATMUL_DTYPE = prev


def _mm_operands(x, w):
    if MATMUL_DTYPE is None:
        return x, w
    return x.astype(MATMUL_DTYPE), w.astype(MATMUL_DTYPE)


# ---------------------------------------------------------------- conv cores

def conv2d(x, p, stride=1, padding="SAME", dilation=1, groups=1):
    """x: (B,H,W,C); p: {'w': (kh,kw,I/groups,O), optional 'b': (O,)}."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    xc, wc = _mm_operands(x, p["w"])
    y = jax.lax.conv_general_dilated(
        xc, wc, window_strides=stride, padding=padding,
        rhs_dilation=dilation, feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=f32)
    if p.get("b") is not None:
        y = y + p["b"]
    return y


def conv_transpose_2x(x, p):
    """Equivalent of torch ConvTranspose2d(k=4, s=2, p=1), expressed as an
    input-dilated conv. `p['w']` is ALREADY the spatially-flipped, IO-swapped
    kernel in HWIO (done once at conversion time)."""
    xc, wc = _mm_operands(x, p["w"])
    y = jax.lax.conv_general_dilated(
        xc, wc, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=f32)
    if p.get("b") is not None:
        y = y + p["b"]
    return y


# -------------------------------------------------------------------- norms

def layer_norm_bias(x, p, eps=1e-5):
    """Restormer WithBias_LayerNorm over the channel axis (extractor.py:90)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["weight"] + p["bias"]


def batch_norm_eval(x, p, eps=1e-5):
    """BatchNorm2d in eval mode (running stats folded per channel)."""
    inv = 1.0 / jnp.sqrt(p["running_var"] + eps)
    return (x - p["running_mean"]) * inv * p["weight"] + p["bias"]


def instance_norm(x, eps=1e-5):
    """InstanceNorm2d(affine=False): per-sample, per-channel spatial norm."""
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps)


def group_norm(x, p, num_groups, eps=1e-5):
    b, h, w, c = x.shape
    g = x.reshape(b, h, w, num_groups, c // num_groups)
    mu = jnp.mean(g, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(g, axis=(1, 2, 4), keepdims=True)
    g = (g - mu) / jnp.sqrt(var + eps)
    return g.reshape(b, h, w, c) * p["weight"] + p["bias"]


# ---------------------------------------------------------- pixel (un)shuffle

def pixel_unshuffle(x, r):
    """torch PixelUnshuffle channel order: out[c*r*r + i*r + j] = in[c] at
    sub-position (i, j)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)                 # (b, h/r, w/r, c, r, r)
    return x.reshape(b, h // r, w // r, c * r * r)


def pixel_shuffle(x, r):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, c // (r * r), r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)                 # (b, h, r, w, r, c')
    return x.reshape(b, h * r, w * r, c // (r * r))


# ----------------------------------------------------------- restormer parts

def gdfn(x, p):
    """Gated-DConv FeedForward (extractor.py:122-140), bias-free."""
    x = conv2d(x, p["project_in"], padding=0)
    x = conv2d(x, p["dwconv"], padding=1, groups=x.shape[-1])
    x1, x2 = jnp.split(x, 2, axis=-1)
    x = jax.nn.gelu(x1, approximate=False) * x2
    return conv2d(x, p["project_out"], padding=0)


def channel_attention(x, p, num_heads):
    """Transposed (channel) attention (extractor.py:143-174)."""
    b, h, w, c = x.shape
    qkv = conv2d(x, p["qkv"], padding=0)
    qkv = conv2d(qkv, p["qkv_dwconv"], padding=1, groups=qkv.shape[-1])
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):  # (b,h,w,c) -> (b, heads, c/heads, h*w)
        t = t.reshape(b, h * w, num_heads, c // num_heads)
        return t.transpose(0, 2, 3, 1)

    q, k, v = heads(q), heads(k), heads(v)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
    qc, kc = _mm_operands(q, k)
    # Per-sample dots (static unroll over the small batch): the batched
    # (b, heads, C, H*W) dot's Mosaic lowering scope-allocates the whole
    # stacked operand in VMEM and overflows the 16M scoped limit at b=2
    # (the [LR, RL]-batched stereo pass); per-sample shapes compile to the
    # same kernels the b=1 path always used.
    attn = jnp.stack([
        jnp.einsum("hcn,hdn->hcd", qc[i], kc[i], preferred_element_type=f32)
        for i in range(b)]) * p["temperature"][:, :, :]
    attn = jax.nn.softmax(attn, axis=-1)
    ac, vc = _mm_operands(attn, v)
    out = jnp.stack([
        jnp.einsum("hcd,hdn->hcn", ac[i], vc[i], preferred_element_type=f32)
        for i in range(b)])
    out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)
    return conv2d(out, p["project_out"], padding=0)


def transformer_block(x, p, num_heads):
    x = x + channel_attention(layer_norm_bias(x, p["norm1"]["body"]),
                              p["attn"], num_heads)
    x = x + gdfn(layer_norm_bias(x, p["norm2"]["body"]), p["ffn"])
    return x


def transformer_stack(x, p, num_heads):
    for i in range(len(p)):
        x = transformer_block(x, p[str(i)], num_heads)
    return x


def downsample(x, p):
    """conv C -> C/2 then PixelUnshuffle(2) => 2C at half res."""
    return pixel_unshuffle(conv2d(x, p["body"]["0"], padding=1), 2)


def upsample(x, p):
    """conv C -> 2C then PixelShuffle(2) => C/2 at double res."""
    return pixel_shuffle(conv2d(x, p["body"]["0"], padding=1), 2)


# ----------------------------------------------------------- RAFT-style parts

def residual_block_instance(x, p):
    """ResidualBlock(norm='instance', stride=1) (extractor.py:9-62)."""
    y = jax.nn.relu(instance_norm(conv2d(x, p["conv1"], padding=1)))
    y = jax.nn.relu(instance_norm(conv2d(y, p["conv2"], padding=1)))
    return jax.nn.relu(x + y)


def basic_conv(x, p, *, deconv=False, stride=1, padding=1, dilation=1,
               bn=True, relu=True):
    """GANet BasicConv: conv/deconv (no bias) + BN(eval) + ReLU
    (nets/feature.py:312-337)."""
    if deconv:
        y = conv_transpose_2x(x, p["conv"])
    else:
        y = conv2d(x, p["conv"], stride=stride, padding=padding,
                   dilation=dilation)
    if bn:
        y = batch_norm_eval(y, p["bn"])
    if relu:
        y = jax.nn.relu(y)
    return y


def conv2x(x, rem, p, *, deconv=False):
    """GANet Conv2x (nets/feature.py:340-374): 2x down(conv s2 k3)/up
    (deconv k4 s2) then concat skip + conv3x3. (The reference's `mdconv`
    flag is dead code — conv2 is always a regular BasicConv.)"""
    x = basic_conv(x, p["conv1"], deconv=deconv, stride=2,
                   padding=1)
    x = jnp.concatenate([x, rem], axis=-1)
    return basic_conv(x, p["conv2"], padding=1)


def avg_pool_2x(x):
    """F.avg_pool2d(x, 3, stride=2, padding=1) with count_include_pad=True
    (torch default), matching update.py:111-112.

    Expressed as two axis-shift 3-sums + a stride-2 slice: plain fused VPU
    adds (lax.reduce_window lowers ~100x slower on v5e at these shapes)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    sy = xp[:, :-2] + xp[:, 1:-1] + xp[:, 2:]
    s = sy[:, :, :-2] + sy[:, :, 1:-1] + sy[:, :, 2:]
    return s[:, ::2, ::2] / 9.0


def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear weights, align_corners=True (static)."""
    pos = np.linspace(0.0, n_in - 1.0, n_out)
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    t = (pos - i0).astype(np.float32)
    M = np.zeros((n_out, n_in), np.float32)
    M[np.arange(n_out), i0] += 1.0 - t
    M[np.arange(n_out), i1] += t
    return M


def interp_bilinear(x, out_h, out_w):
    """F.interpolate(mode='bilinear', align_corners=True).

    Bilinear resampling is separable with STATIC weights, so it runs as two
    dense matmuls against (out, in) interpolation matrices on the MXU —
    the per-element gather formulation costs ~5.5 ms at (72,120,128)->2x
    on v5e; the matmuls are ~100x cheaper."""
    b, h, w, c = x.shape
    if h == out_h and w == out_w:
        return x
    Wy = jnp.asarray(_interp_matrix(h, out_h), x.dtype)
    Wx = jnp.asarray(_interp_matrix(w, out_w), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", Wy, x,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("pw,bowc->bopc", Wx, y,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


# ----------------------------------------------------------------- params

def _he(rng, shape):
    fan_in = int(np.prod(shape[:-1]))
    return jax.random.normal(rng, shape, f32) * math.sqrt(2.0 / fan_in)


class ParamMaker:
    """Tiny helper to build randomly-initialized parameter pytrees with the
    same tree structure the torch converter produces."""

    def __init__(self, seed=0):
        self.rng = jax.random.PRNGKey(seed)

    def take(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    def conv(self, kh, kw, cin, cout, bias=True):
        p = {"w": _he(self.take(), (kh, kw, cin, cout))}
        p["b"] = jnp.zeros((cout,), f32) if bias else None
        return p

    def bn(self, c):
        return {"weight": jnp.ones((c,), f32), "bias": jnp.zeros((c,), f32),
                "running_mean": jnp.zeros((c,), f32),
                "running_var": jnp.ones((c,), f32)}

    def ln(self, c):
        return {"body": {"weight": jnp.ones((c,), f32),
                         "bias": jnp.zeros((c,), f32)}}

    def attn(self, c, heads):
        return {"qkv": self.conv(1, 1, c, 3 * c, bias=False),
                "qkv_dwconv": self.conv(3, 3, 1, 3 * c, bias=False),
                "project_out": self.conv(1, 1, c, c, bias=False),
                "temperature": jnp.ones((heads, 1, 1), f32)}

    def ffn(self, c, expansion=2.66):
        hidden = int(c * expansion)
        return {"project_in": self.conv(1, 1, c, 2 * hidden, bias=False),
                "dwconv": self.conv(3, 3, 1, 2 * hidden, bias=False),
                "project_out": self.conv(1, 1, hidden, c, bias=False)}

    def tblock(self, c, heads):
        return {"norm1": self.ln(c), "attn": self.attn(c, heads),
                "norm2": self.ln(c), "ffn": self.ffn(c)}

    def tstack(self, n, c, heads):
        return {str(i): self.tblock(c, heads) for i in range(n)}

    def basic_conv(self, cin, cout, k=3, bn=True, deconv=False):
        p = {"conv": self.conv(k, k, cin, cout, bias=False)}
        if bn:
            p["bn"] = self.bn(cout)
        return p

    def conv2x(self, cin, cout, deconv=False):
        k = 4 if deconv else 3
        return {"conv1": self.basic_conv(cin, cout, k=k, deconv=deconv),
                "conv2": self.basic_conv(cout * 2, cout)}
