"""Generator zoo: U-Net (paired pix2pix) and ResNet (CycleGAN) generators.

Capability parity: ``UnetGenerator`` / ``ResnetGenerator`` of the reference's
``models/networks.py`` (SURVEY.md section 2.2 "Network zoo" [K]). Channel
schedules, norm placement, bias rules and dropout placement follow the
reference family exactly (validated against a torch oracle in
tests/unit/test_torch_parity.py), but the implementation is TPU-first:

* NHWC, iterative (non-recursive) U-Net so XLA sees one flat graph;
* every conv/pad/norm accepts a ``SpatialCtx`` so the whole generator can run
  with its width (longitude) axis sharded over the device mesh — halo
  exchange instead of local padding, cross-shard instance-norm stats — giving
  *exact* full-globe tiled inference (parallel/spatial.py);
* optional periodic ('wrap') width padding for the longitude axis of global
  climate fields.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from biasgan_tpu.nn.layers import (
    Conv2d,
    ConvTranspose2d,
    Norm,
    SpatialCtx,
    norm_act,
    norm_uses_bias,
)

Array = jax.Array


def _lrelu(x: Array) -> Array:
    return nn.leaky_relu(x, negative_slope=0.2)


def _check_spatial(ctx: Optional[SpatialCtx], w: int, stride: int, where: str) -> None:
    if ctx is not None and w % stride != 0:
        raise ValueError(
            f"{where}: sharded local width {w} not divisible by stride {stride}; "
            "pad the global field to a multiple of n_shards * 2^n_downsamples"
        )


class UNetGenerator(nn.Module):
    """U-Net generator, reference ``UnetGenerator`` semantics.

    ``num_downs`` stride-2 4x4 convs down to a bottleneck, mirrored by
    stride-2 4x4 conv-transposes with skip concatenation (input-first order,
    as the reference's ``cat([x, model(x)], 1)``). unet_256 <=> num_downs=8,
    unet_128 <=> num_downs=7. Dropout(0.5) on the (num_downs-5) intermediate
    8*ngf up blocks when ``use_dropout``.
    """

    output_nc: int
    ngf: int = 64
    num_downs: int = 8
    norm_type: str = "batch"
    use_dropout: bool = False
    out_activation: str = "tanh"  # 'none' for unbounded standardized fields
    w_mode: str = "zero"  # 'wrap' for periodic longitude
    init_type: str = "normal"
    init_gain: float = 0.02
    compute_dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: Array,
        train: bool = False,
        ctx: Optional[SpatialCtx] = None,
    ) -> Array:
        D = self.num_downs
        use_bias = norm_uses_bias(self.norm_type)
        dc = [min(2**i, 8) * self.ngf for i in range(D)]  # down channels

        def conv_down(i: int, h: Array) -> Array:
            _check_spatial(ctx, h.shape[2], 2, f"unet down{i}")
            return Conv2d(
                dc[i],
                (4, 4),
                strides=(2, 2),
                padding=(1, 1),
                use_bias=use_bias,
                w_mode=self.w_mode,
                init_type=self.init_type,
                init_gain=self.init_gain,
                compute_dtype=self.compute_dtype,
                name=f"down{i}",
            )(h, ctx)

        def conv_up(i: int, h: Array, features: int, bias: bool) -> Array:
            return ConvTranspose2d(
                features,
                (4, 4),
                strides=(2, 2),
                padding=(1, 1),
                use_bias=bias,
                w_mode="wrap" if self.w_mode == "wrap" else "zero",
                init_type=self.init_type,
                init_gain=self.init_gain,
                compute_dtype=self.compute_dtype,
                name=f"up{i}",
            )(h, ctx)

        # --- encoder ---
        d = []
        h = conv_down(0, x)  # outermost: no pre-activation, no norm
        d.append(h)
        for i in range(1, D):
            h = conv_down(i, _lrelu(h))
            if i < D - 1:  # innermost down has no norm
                h = Norm(self.norm_type, dtype=self.compute_dtype, name=f"down_norm{i}")(h, train, ctx)
            d.append(h)

        # --- decoder ---
        u = conv_up(D - 1, nn.relu(d[D - 1]), dc[D - 2], use_bias)  # innermost
        u = Norm(self.norm_type, dtype=self.compute_dtype, name=f"up_norm{D-1}")(u, train, ctx)
        for i in range(D - 2, 0, -1):
            u = jnp.concatenate([d[i], u], axis=-1)
            u = conv_up(i, nn.relu(u), dc[i - 1], use_bias)
            u = Norm(self.norm_type, dtype=self.compute_dtype, name=f"up_norm{i}")(u, train, ctx)
            if self.use_dropout and dc[i] == dc[i - 1] == 8 * self.ngf:
                u = nn.Dropout(0.5, deterministic=not train, name=f"drop{i}")(u)
        u = jnp.concatenate([d[0], u], axis=-1)
        u = conv_up(0, nn.relu(u), self.output_nc, True)  # outermost: bias on
        u = u.astype(jnp.float32)
        return jnp.tanh(u) if self.out_activation == "tanh" else u


class ResNetBlock(nn.Module):
    """Reference ``ResnetBlock``: reflect-pad 3x3 conv, norm, relu,
    [dropout], reflect-pad 3x3 conv, norm, residual add."""

    dim: int
    norm_type: str = "instance"
    use_dropout: bool = False
    w_mode: str = "reflect"
    init_type: str = "normal"
    init_gain: float = 0.02
    compute_dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: Array,
        train: bool = False,
        ctx: Optional[SpatialCtx] = None,
        fused_plan=None,
    ) -> Array:
        use_bias = norm_uses_bias(self.norm_type)

        def convmod(name: str) -> Conv2d:
            return Conv2d(
                self.dim,
                (3, 3),
                padding=(1, 1),
                use_bias=use_bias,
                h_mode="reflect",
                w_mode=self.w_mode,
                init_type=self.init_type,
                init_gain=self.init_gain,
                compute_dtype=self.compute_dtype,
                name=name,
            )

        def conv(name: str, h: Array) -> Array:
            return convmod(name)(h, ctx)

        if fused_plan is not None:
            # Fused inference path (perf_gates.fused_block(), instance norm,
            # no dropout): both convs run ops/pallas_conv.conv3x3_fused — SAME
            # pad assembled in-kernel, norm0+ReLU applied as conv1's
            # prologue, per-(N,C) moments emitted by the kernels — so the
            # normalized activation and the pad copies never round-trip HBM.
            # Only the final norm1 + residual add runs as one XLA
            # elementwise pass. Semantics equal the unfused path (relu and
            # the bf16 downcast commute; stats are f32 of the stored conv
            # output exactly like instance_norm) — tests/unit/
            # test_fused_block.py asserts equivalence.
            from biasgan_tpu.ops.pallas_conv import (
                apply_affine,
                embed_halo_w,
                instance_moments_to_affine,
            )

            if ctx is not None:
                # Spatially-sharded composition (--fused_blocks x
                # --spatial_mesh): each conv's SAME-pad columns are the ring
                # neighbors' edge columns (HaloCtx.pad_w — ppermute or RDMA),
                # embedded in the kernel's scratch layout and consumed with
                # w_mode='halo'; instance-norm moments are psum'd over the
                # spatial axis so the affine is W-GLOBAL, exactly like the
                # unfused spatial path (parallel/spatial.py design note).
                # Equivalence to the whole-field forward:
                # tests/distributed/test_fused_spatial.py.
                count = fused_plan.logical_h * x.shape[2] * ctx.n_shards

                def exchange(h, edge_raw=None):
                    """Halo-exchange h's edge columns into the kernel's
                    pre-padded layout. ``edge_raw`` ((N, C), raw space)
                    overwrites the GLOBAL-edge halo columns when the field
                    is non-periodic: the whole-field semantics zero the
                    SAME-pad column AFTER the prologue affine, but the
                    halo carries the RAW conv output — so the edge value
                    must be the pre-image of post-prologue zero, i.e. the
                    instance mean -b/a (ReLU then keeps the 0). ppermute's
                    zero-fill is only correct for the un-prologue'd conv.
                    Precision note: the preimage is cast to the compute
                    dtype, so post-prologue the edge column is a*cast(-b/a)
                    + b ~= O(|b| * eps_dtype), not exactly 0 — in bf16 a
                    ~0.4%-of-|b| seam confined to the two GLOBAL edge
                    columns (in-kernel 'zero' mode selects an exact 0).
                    Only non-periodic W reaches this; climate fields wrap."""
                    hp = ctx.pad_w(h, 1, 1)
                    if edge_raw is not None and not ctx.periodic:
                        r = jax.lax.axis_index(ctx.axis)
                        col = jax.lax.broadcasted_iota(
                            jnp.int32, (1, 1, hp.shape[2], 1), 2
                        )
                        mask = ((r == 0) & (col == 0)) | (
                            (r == ctx.n_shards - 1)
                            & (col == hp.shape[2] - 1)
                        )
                        pv = edge_raw[:, None, None, :].astype(hp.dtype)
                        hp = jnp.where(mask, pv, hp)
                    return embed_halo_w(hp)

                def gsum(m):
                    return jax.tree_util.tree_map(
                        lambda v: jax.lax.psum(v, ctx.axis), m
                    )

                y0, m0 = convmod("conv0")(
                    exchange(x), ctx, fused_plan=fused_plan,
                    want_moments=True, w_halo=True, fused_diff=train,
                )
                a0, b0 = instance_moments_to_affine(*gsum(m0), count)
                y1, m1 = convmod("conv1")(
                    exchange(y0, edge_raw=-b0 / a0), ctx,
                    fused_plan=fused_plan,
                    prologue=(a0, b0), want_moments=True, w_halo=True,
                    fused_diff=train,
                )
                a1, b1 = instance_moments_to_affine(*gsum(m1), count)
                return apply_affine(y1, a1, b1) + x

            count = fused_plan.logical_h * x.shape[2]
            y0, m0 = convmod("conv0")(
                x, ctx, fused_plan=fused_plan, want_moments=True,
                fused_diff=train,
            )
            a0, b0 = instance_moments_to_affine(*m0, count)
            y1, m1 = convmod("conv1")(
                y0, ctx, fused_plan=fused_plan, prologue=(a0, b0),
                want_moments=True, fused_diff=train,
            )
            a1, b1 = instance_moments_to_affine(*m1, count)
            return apply_affine(y1, a1, b1) + x

        h = conv("conv0", x)
        h = norm_act(h, self.norm_type, "norm0", train, ctx, activation="relu", dtype=self.compute_dtype)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        h = conv("conv1", h)
        # fused: instance_norm(h) + x in one kernel (Pallas on TPU)
        return norm_act(h, self.norm_type, "norm1", train, ctx, residual=x, dtype=self.compute_dtype)


class ResNetGenerator(nn.Module):
    """Reference ``ResnetGenerator``: 7x7 stem, 2x stride-2 down, ``n_blocks``
    residual blocks, 2x stride-2 conv-transpose up, 7x7 head + tanh.
    resnet_9blocks <=> n_blocks=9, resnet_6blocks <=> n_blocks=6.

    Local receptive field (unlike the full-image U-Net bottleneck), which
    makes it the natural generator for halo-sharded full-globe inference.
    """

    output_nc: int
    ngf: int = 64
    n_blocks: int = 9
    norm_type: str = "instance"
    use_dropout: bool = False
    out_activation: str = "tanh"  # 'none' for unbounded standardized fields
    w_mode: str = "reflect"  # 'wrap' for periodic longitude
    init_type: str = "normal"
    init_gain: float = 0.02
    compute_dtype: Any = None

    def _fused_block_plan(self, h: Array, train: bool, ctx):
        """Gate + plan for the fused resnet-block path (perf_gates
        fused_block: '1' on TPU, 'interpret' for CPU tests — driven by
        --fused_blocks via fused_blocks_engage, BIASGAN_FUSED_BLOCK env as
        the test override): instance norm, no dropout, aligned LOCAL W,
        C >= 128. Training additionally requires the fused_train opt-in
        (train.py --fused_blocks sets it): the convs then run
        conv3x3_fused_t — same forward kernel plus the exact custom VJP.
        Composes with spatial sharding (ctx = HaloCtx): pads become
        halo-exchanged neighbor columns and moments are psum'd W-globally
        (the w_mode 'halo' path in ops/pallas_conv.py), so eligibility
        under ctx only needs the per-shard width aligned."""
        from biasgan_tpu import perf_gates

        fb = perf_gates.fused_block()
        if (
            fb in ("", "0")  # "0" = explicit off (perf-gate convention)
            or (train and not perf_gates.fused_train())
            or self.norm_type != "instance"
            or self.use_dropout
        ):
            return None
        if ctx is not None and not hasattr(ctx, "pad_w"):
            return None  # unknown sharding protocol: take the safe path
        if fb != "interpret" and jax.default_backend() != "tpu":
            return None
        _, hh, ww, cc = h.shape
        if cc < perf_gates.fused_min_c():
            return None
        from biasgan_tpu.ops.pallas_conv import fused_block_plan

        dt = (
            jnp.dtype(self.compute_dtype)
            if self.compute_dtype is not None
            else h.dtype
        )
        return fused_block_plan(hh, ww, cc, cc, dt, fb == "interpret")

    def _fused_updown_plans(self, h: Array, train: bool, ctx, which: str):
        """Gate + plans for the fused down/up paths (same fused_block
        opt-in as the block chain): ``which='down'`` takes the STEM INPUT
        shape and returns (down0, down1) conv3x3s2 plans; ``which='up'``
        takes the block-resolution shape and returns (up0, up1) convt plans.
        None -> XLA default path."""
        from biasgan_tpu import perf_gates

        fb = perf_gates.fused_block()
        if (fb in ("", "0") or train or self.norm_type != "instance"
                or ctx is not None):
            return None
        if fb != "interpret" and jax.default_backend() != "tpu":
            return None
        # The down/up kernels are a separate opt-in: measured r3 on the v5e
        # they LOSE to XLA at the globe shapes (pre 15.0 vs 9.8 ms, post
        # 11.7 vs 11.2 — BASELINE.md r3 fused-block section), unlike the
        # block chain, so the fused_block gate alone keeps the measured
        # optimum (blocks-only). Interpret mode (CPU tests) exercises them
        # unconditionally.
        if fb != "interpret" and not perf_gates.fused_updown():
            return None
        # gate on the largest channel width in the chain (ngf*4), the same
        # knob the block gate uses (--fused_min_c, default 128)
        if self.ngf * 4 < perf_gates.fused_min_c():
            return None
        from biasgan_tpu.ops.pallas_conv import (
            conv3x3s2_plan,
            convt3x3s2_plan,
        )

        interp = fb == "interpret"
        dt = (
            jnp.dtype(self.compute_dtype)
            if self.compute_dtype is not None
            else h.dtype
        )
        _, hh, ww, _ = h.shape
        if which == "down":
            if hh % 4 or ww % 4:
                return None
            p0 = conv3x3s2_plan(hh, ww, self.ngf, self.ngf * 2, dt, interp)
            p1 = conv3x3s2_plan(
                hh // 2, ww // 2, self.ngf * 2, self.ngf * 4, dt, interp
            )
            return None if p0 is None or p1 is None else (p0, p1)
        q0 = convt3x3s2_plan(hh, ww, self.ngf * 4, self.ngf * 2, dt, interp)
        q1 = convt3x3s2_plan(
            2 * hh, 2 * ww, self.ngf * 2, self.ngf, dt, interp
        )
        return None if q0 is None or q1 is None else (q0, q1)

    @nn.compact
    def __call__(
        self,
        x: Array,
        train: bool = False,
        ctx: Optional[SpatialCtx] = None,
        stage: str = "all",
    ) -> Array:
        """``stage``: 'all' (default) | 'pre' (stem+downs) | 'blocks' |
        'post' (ups+head). The staged entry points exist for the fused-block
        inference path: running the three regions as SEPARATE jit calls
        recovers the ~9 ms/field cross-region scheduling penalty XLA adds
        when opaque pallas calls sit mid-graph (measured,
        tools/bench_fused_block.py; async dispatch hides the extra enqueues).
        Init with stage='all'; the stage calls reuse the same params."""
        use_bias = norm_uses_bias(self.norm_type)
        common = dict(
            init_type=self.init_type,
            init_gain=self.init_gain,
            compute_dtype=self.compute_dtype,
        )
        h = x
        zero_w = "zero" if self.w_mode != "wrap" else "wrap"
        if stage in ("all", "pre"):
            down_plans = self._fused_updown_plans(h, train, ctx, "down")
            h = Conv2d(
                self.ngf,
                (7, 7),
                padding=(3, 3),
                use_bias=use_bias,
                h_mode="reflect",
                w_mode=self.w_mode,
                name="stem",
                **common,
            )(h, ctx)

            def down_mod(i: int) -> Conv2d:
                return Conv2d(
                    self.ngf * 2 ** (i + 1),
                    (3, 3),
                    strides=(2, 2),
                    padding=(1, 1),
                    use_bias=use_bias,
                    w_mode=zero_w,
                    name=f"down{i}",
                    **common,
                )

            if down_plans is not None:
                # Fused down path: the stem's instance-norm+ReLU rides into
                # down0 as a prologue (stats fused into the stem conv's
                # epilogue by XLA), down0's norm rides into down1, and only
                # down1's norm runs as one XLA affine pass — each
                # activation crosses HBM once (ops/pallas_conv.py,
                # conv3x3s2_fused).
                from biasgan_tpu.ops.pallas_conv import (
                    apply_affine,
                    instance_moments_to_affine,
                )

                hf = h.astype(jnp.float32)
                a, b = instance_moments_to_affine(
                    hf.sum((1, 2)), (hf * hf).sum((1, 2)),
                    h.shape[1] * h.shape[2],
                )
                for i in range(2):
                    h, m = down_mod(i)(
                        h, ctx, fused_s2_plan=down_plans[i],
                        prologue=(a, b), want_moments=True,
                    )
                    a, b = instance_moments_to_affine(
                        *m, h.shape[1] * h.shape[2]
                    )
                h = apply_affine(h, a, b, relu=True)
            else:
                h = norm_act(h, self.norm_type, "stem_norm", train, ctx, activation="relu", dtype=self.compute_dtype)
                # downsample (zero padding, reference semantics)
                for i in range(2):
                    _check_spatial(ctx, h.shape[2], 2, f"resnet down{i}")
                    h = down_mod(i)(h, ctx)
                    h = norm_act(
                        h, self.norm_type, f"down_norm{i}", train, ctx, activation="relu",
                        dtype=self.compute_dtype,
                    )
            if stage == "pre":
                return h
        if stage in ("all", "blocks"):
            fused_plan = self._fused_block_plan(h, train, ctx)
            logical_h = h.shape[1]
            if fused_plan is not None and fused_plan.h_run > logical_h:
                # ceil-pad H once for the whole chain; fused kernels index
                # the LOGICAL h so the tail rows are write-only garbage,
                # sliced off below (the real full-globe H inside the blocks
                # is 181, prime)
                h = jnp.pad(
                    h,
                    ((0, 0), (0, fused_plan.h_run - logical_h), (0, 0), (0, 0)),
                )
            for i in range(self.n_blocks):
                h = ResNetBlock(
                    self.ngf * 4,
                    norm_type=self.norm_type,
                    use_dropout=self.use_dropout,
                    w_mode=self.w_mode,
                    name=f"block{i}",
                    **common,
                )(h, train, ctx, fused_plan=fused_plan)
            if fused_plan is not None and fused_plan.h_run > logical_h:
                h = h[:, :logical_h]
            if stage == "blocks":
                return h
        # upsample
        up_plans = self._fused_updown_plans(h, train, ctx, "up")

        def up_mod(i: int) -> ConvTranspose2d:
            return ConvTranspose2d(
                self.ngf * 2 ** (1 - i),
                (3, 3),
                strides=(2, 2),
                padding=(1, 1),
                output_padding=(1, 1),
                use_bias=use_bias,
                w_mode="wrap" if self.w_mode == "wrap" else "zero",
                name=f"up{i}",
                **common,
            )

        if up_plans is not None:
            # Fused up path (ops/pallas_conv.convt3x3s2_fused): up0's norm
            # rides into up1 as a prologue; up1's norm runs as one XLA
            # affine pass fused into the phase-interleave stack.
            from biasgan_tpu.ops.pallas_conv import (
                apply_affine,
                instance_moments_to_affine,
            )

            a = b = None
            for i in range(2):
                prologue = None if a is None else (a, b)
                h, m = up_mod(i)(
                    h, ctx, fused_plan=up_plans[i], prologue=prologue,
                    want_moments=True,
                )
                a, b = instance_moments_to_affine(
                    *m, h.shape[1] * h.shape[2]
                )
            h = apply_affine(h, a, b, relu=True)
        else:
            for i in range(2):
                h = up_mod(i)(h, ctx)
                h = norm_act(
                    h, self.norm_type, f"up_norm{i}", train, ctx, activation="relu",
                    dtype=self.compute_dtype,
                )
        # head
        h = Conv2d(
            self.output_nc,
            (7, 7),
            padding=(3, 3),
            use_bias=True,
            h_mode="reflect",
            w_mode=self.w_mode,
            name="head",
            **common,
        )(h, ctx)
        h = h.astype(jnp.float32)
        return jnp.tanh(h) if self.out_activation == "tanh" else h
