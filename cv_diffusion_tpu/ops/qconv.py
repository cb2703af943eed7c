"""Quantizing convolution: optional int8 activation×weight compute.

TPU-native counterpart of the reference's *executed* int8 inference
(``/root/reference/src/export/quantization.py:144-271`` — qnnpack/fbgemm
dynamic + static PTQ).  There the runtime quantizes per-op on a mobile CPU;
here the int8 compute path is compiled into the XLA graph (AQT-style):

    x_int8 = round(x / s_x)               (s_x static per module)
    y_int32 = conv(x_int8, w_int8)        (MXU int8, preferred int32)
    y = y_int32 * (s_x * s_w[c])          (dequant fused into the conv output)

Scale provenance:

* **Static bound** — modules whose input is ReLU6-clipped (the IRB expand /
  depthwise / project chain under ``quantization_friendly=True``) have a
  *known* input range [0, 6]; their scale is fixed at 6/127 with no
  calibration at all.  This is the pay-off of the reference's
  "quantization friendly" design knob.
* **Calibrated amax** — every other module records its input absmax into the
  ``act_scales`` flax collection when applied with
  ``mutable=["act_scales"]`` (the PTQ calibration pass,
  :func:`cv_diffusion_tpu.export.quantization.calibrate_act_scales`).

With ``act_quant=False`` (default, training) the module is numerically and
structurally identical to ``flax.linen.Conv`` (same param names/shapes, same
initializers), so trained checkpoints load directly into the quantized model.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

Dtype = Any
PaddingLike = Union[str, Sequence[Tuple[int, int]]]


@jax.custom_vjp
def _ste_round(x):
    return jnp.round(x)


def _ste_fwd(x):
    return jnp.round(x), None


def _ste_bwd(_, g):
    return (g,)  # straight-through: d round(x)/dx ≈ 1


_ste_round.defvjp(_ste_fwd, _ste_bwd)


class QConv(nn.Module):
    """``nn.Conv``-compatible conv with an optional int8 compute path."""

    features: int
    kernel_size: Tuple[int, int] = (1, 1)
    strides: Tuple[int, int] = (1, 1)
    padding: PaddingLike = "VALID"
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    # int8 path -----------------------------------------------------------
    # False = float; True = int8 activation×weight serving compute;
    # "fake" = activation-aware QAT: the forward quantizes→dequantizes the
    # activations with the SAME scale provenance as the int8 path, but in
    # float with straight-through gradients, so fine-tuning can adapt the
    # weights to the activation-quantization noise (the int8 path is not
    # differentiable: int8 conv + non-STE rounds).
    act_quant: Any = False
    # Known static input bound (e.g. 6.0 after ReLU6); None = calibrate.
    act_bound: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel_shape = self.kernel_size + (
            in_features // self.feature_group_count, self.features)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            kernel_shape, jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)

        if not self.act_quant:
            y = self._float_conv(x, kernel)
        elif self.act_quant == "fake":
            y = self._fake_quant_conv(x, kernel)
        else:
            y = self._int8_conv(x, kernel)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        # Offered-for-saving under UNetConfig.remat_policy="conv"
        # (jax.checkpoint_policies.save_only_these_names): the backward then
        # recomputes only the elementwise work between convs. An identity
        # outside jax.checkpoint.
        return checkpoint_name(y, "conv_out")

    # ------------------------------------------------------------------
    def _conv(self, x, kernel, ptype=None):
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, kernel, self.strides, self.padding, dimension_numbers=dn,
            feature_group_count=self.feature_group_count,
            preferred_element_type=ptype)

    def _float_conv(self, x, kernel):
        dtype = jnp.dtype(self.dtype)
        return self._conv(x.astype(dtype), kernel.astype(dtype))

    def _fake_quant_conv(self, x, kernel):
        """Activation-aware QAT forward: quantize→dequantize the input with
        the int8 path's exact scale rules (static ReLU6 bound, calibrated
        amax, or dynamic per-batch fallback), STE gradients, float conv.

        Weight fake-quant is NOT applied here — it stays with
        ``export.qat.fake_quant_params`` (the train-step ``params_transform``
        hook), the single weight-quantization simulation shared by weight-only
        QAT, so the two compose without double-rounding the kernels.

        No ``act_scales`` variable is declared (unlike the int8 path): the
        train step applies with a params-only variables dict, and a params
        tree identical to the float model's is what lets QAT checkpoints
        load straight into float OR int8 serving.  Unbounded modules use a
        dynamic per-batch scale — the distribution the export's PTQ
        calibration later captures as a static amax."""
        xf = x.astype(jnp.float32)
        if self.act_bound is not None:
            amax_eff = jnp.asarray(float(self.act_bound), jnp.float32)
        else:
            amax_eff = jax.lax.stop_gradient(jnp.max(jnp.abs(xf)))
        s_x = jnp.maximum(amax_eff, 1e-6) / 127.0
        xq = jnp.clip(_ste_round(xf / s_x), -127, 127) * s_x
        # f32 conv: bf16 would re-round the dequantized grid points and the
        # forward would no longer match the int8 path's values
        y = self._conv(xq, kernel.astype(jnp.float32),
                       ptype=jnp.float32)
        return y.astype(jnp.dtype(self.dtype))

    def _int8_conv(self, x, kernel):
        init_amax = float(self.act_bound) if self.act_bound is not None else 0.0
        amax = self.variable("act_scales", "amax",
                             lambda: jnp.asarray(init_amax, jnp.float32))
        calibrating = (self.is_mutable_collection("act_scales")
                       and self.act_bound is None
                       and not self.is_initializing())
        if calibrating:
            amax.value = jnp.maximum(
                amax.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
            # During calibration run the float path so recorded stats are
            # exact.
            return self._float_conv(x, kernel)

        # A module still at amax==0 (never calibrated, no static bound)
        # falls back to a DYNAMIC per-batch scale — the reference's dynamic-
        # quantization semantics — instead of saturating everything against
        # a degenerate 1e-6 scale.
        amax_eff = jnp.where(amax.value > 0.0, amax.value,
                             jnp.max(jnp.abs(x.astype(jnp.float32))))
        s_x = jnp.maximum(amax_eff, 1e-6) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                      -127, 127).astype(jnp.int8)

        k32 = kernel.astype(jnp.float32)
        k_absmax = jnp.max(jnp.abs(k32), axis=(0, 1, 2))  # per out channel
        s_w = jnp.maximum(k_absmax / 127.0, 1e-12)
        kq = jnp.clip(jnp.round(k32 / s_w), -127, 127).astype(jnp.int8)

        y32 = self._conv(xq, kq, ptype=jnp.int32)
        y = y32.astype(jnp.float32) * (s_x * s_w)
        return y.astype(jnp.dtype(self.dtype))
