"""Stacked ConvLSTM sequence-to-sequence forecaster (video / radar nowcasting).

North-star model family (BASELINE.json configs #1/#3/#4/#5): N stacked ConvLSTM
layers consume ``input_frames`` frames, then roll out ``output_frames`` future frames
autoregressively, with optional scheduled sampling (teacher forcing with per-step
Bernoulli probability) for training stability. The reference repo's Generator only
reconstructs aligned timesteps (SURVEY.md §0); future rollout is the extension the
driver benchmarks ("10-frame 128x128 rollouts").

TPU-first design: encode and decode phases run as ONE ``lax.scan`` of length
``T_in + T_out - 1``; phase switching is a static per-step mask passed as scan inputs,
so there is a single compiled step body and no unrolled Python loop. Scheduled-sampling
Bernoulli draws are precomputed outside the scan (shape [S, B]) — no RNG threading
through the carry. Sequence-length scaling (the build's answer to sequence parallelism,
SURVEY.md §5) comes from this scan plus optional ``jax.checkpoint`` on the body."""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Conv2dTorch, ConvLSTMCell


class _StackedStepCore(nn.Module):
    """One scan step: input select -> stacked cells -> conv head."""
    hidden_dims: Tuple[int, ...]
    out_channels: int
    kernel_size: int
    impl: str
    dtype: Optional[jnp.dtype]
    param_dtype: jnp.dtype
    tp_shards: int = 1
    tp_mesh: Optional[object] = None
    tp_axis: str = "model"

    @nn.compact
    def __call__(self, carry, step_inputs):
        states, prev_out = carry
        frame_t, use_frame, teacher_t, use_teacher = step_inputs
        # encode phase: feed the observed frame; decode phase: feed our previous
        # prediction, or the ground-truth target when teacher forcing fires.
        x = jnp.where(use_frame[:, None, None, None], frame_t,
                      jnp.where(use_teacher[:, None, None, None], teacher_t, prev_out))
        new_states = []
        for li, feat in enumerate(self.hidden_dims):
            h, c = states[li]
            h, c = ConvLSTMCell(feat, self.kernel_size, impl=self.impl,
                                dtype=self.dtype, param_dtype=self.param_dtype,
                                tp_shards=self.tp_shards, tp_mesh=self.tp_mesh,
                                tp_axis=self.tp_axis,
                                name=f"cell_{li}")(x, h, c)
            new_states.append((h, c))
            x = h
        out = Conv2dTorch(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="head")(x)
        return (tuple(new_states), out), out


class ConvLSTMForecaster(nn.Module):
    """frames [B, T_in, C, H, W] -> predictions [B, T_out, C, H, W]."""
    hidden_dims: Sequence[int] = (64, 64, 64)
    input_frames: int = 5
    output_frames: int = 20
    in_channels: int = 1
    kernel_size: int = 3
    convlstm_impl: str = "xla"
    remat: bool = False   # rematerialize the scan body: O(1) activation memory in T
    # selective remat policy (only with remat=True): "" = save nothing (full
    # recompute); "save_z" = save each cell's conv pre-activation and recompute
    # only the elementwise gates in the backward — cuts stored-activation HBM
    # traffic without re-running the convs; "dots" = jax dots_saveable
    remat_policy: str = ""
    scan_unroll: int = 1  # lax.scan unroll factor (cross-step fusion headroom)
    # split the AD-transposed (backward) scan into two scans — an XLA
    # scheduling lever on the bwd pass, which dominates the train step
    scan_split_transpose: bool = False
    # tensor parallelism: channel-shard every cell over `tp_shards` devices on
    # the mesh's `tp_axis` (params in shard-major per-gate layout — see
    # ops.convlstm.convlstm_step_tp and parallel.tensor_parallel). The scaling
    # path for hidden widths beyond one chip; hidden_dims must divide tp_shards.
    tp_shards: int = 1
    tp_mesh: Optional[object] = None   # jax.sharding.Mesh (static attribute)
    tp_axis: str = "model"
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, frames, targets=None, teacher_forcing_prob=0.0, rng=None):
        """targets [B, T_out, C, H, W] + rng enable scheduled sampling during
        training; at inference leave both unset (pure autoregressive rollout)."""
        b, t_in, c, h, w = frames.shape
        assert t_in == self.input_frames, (t_in, self.input_frames)
        if self.tp_shards > 1:
            bad = [f for f in self.hidden_dims if f % self.tp_shards]
            assert not bad, (
                f"hidden_dims {bad} not divisible by tp_shards={self.tp_shards}")
        t_out = self.output_frames
        steps = t_in + t_out - 1
        cdtype = self.dtype or frames.dtype

        x = jnp.transpose(frames, (1, 0, 3, 4, 2)).astype(cdtype)  # [T_in,B,H,W,C]
        # per-step scan inputs, padded to the full step count
        pad = jnp.zeros((steps - t_in, b, h, w, c), cdtype)
        frame_seq = jnp.concatenate([x, pad], axis=0)
        use_frame = (jnp.arange(steps) < t_in)
        use_frame = jnp.broadcast_to(use_frame[:, None], (steps, b))

        if targets is not None:
            tgt = jnp.transpose(targets, (1, 0, 3, 4, 2)).astype(cdtype)
            # Step s emits prediction outs[s] = target[s - t_in + 1], so the
            # teacher-forced input at step s must be the ground truth of the
            # PREVIOUS frame: target[s - t_in]. Hence t_in leading zeros (encode
            # steps use the observed frame; teacher_seq there is never selected).
            # A (t_in - 1)-zero pad would feed each step its own label — an
            # identity shortcut that silently degrades free-running rollout.
            tpad = jnp.zeros((t_in, b, h, w, c), cdtype)
            teacher_seq = jnp.concatenate([tpad, tgt], axis=0)[:steps]
        else:
            teacher_seq = jnp.zeros((steps, b, h, w, c), cdtype)

        if rng is not None and targets is not None:
            draws = jax.random.bernoulli(rng, teacher_forcing_prob, (steps, b))
        else:
            draws = jnp.zeros((steps, b), bool)
        use_teacher = draws & ~use_frame

        zeros = lambda f: jnp.zeros((b, h, w, f), cdtype)
        states0 = tuple((zeros(f), zeros(f)) for f in self.hidden_dims)
        carry0 = (states0, jnp.zeros((b, h, w, c), cdtype))

        # long-sequence scaling (SURVEY.md §5): scan keeps compiled size O(1) in T;
        # remat additionally drops per-step activations and recomputes them in the
        # backward pass — memory O(1) in rollout length.
        if self.remat:
            policies = {
                "": None,
                "save_z": jax.checkpoint_policies.save_only_these_names(
                    "convlstm_z"),
                "dots": jax.checkpoint_policies.dots_saveable,
            }
            if self.remat_policy not in policies:
                raise ValueError(
                    f"Unknown remat_policy: {self.remat_policy!r} "
                    f"(valid: {sorted(policies)})")
            if self.remat_policy == "save_z" and self.convlstm_impl == "pallas":
                raise ValueError(
                    "remat_policy 'save_z' requires convlstm_impl 'xla': the "
                    "pallas cell does not tag its conv pre-activations, so "
                    "the policy would silently degrade to full recompute")
            body = nn.remat(_StackedStepCore,
                            policy=policies[self.remat_policy])
        else:
            body = _StackedStepCore
        core = nn.scan(body,
                       variable_broadcast="params",
                       split_rngs={"params": False},
                       in_axes=0, out_axes=0,
                       unroll=self.scan_unroll,
                       _split_transpose=self.scan_split_transpose)(
            hidden_dims=tuple(self.hidden_dims), out_channels=c,
            kernel_size=self.kernel_size, impl=self.convlstm_impl,
            dtype=cdtype, param_dtype=self.param_dtype,
            tp_shards=self.tp_shards, tp_mesh=self.tp_mesh,
            tp_axis=self.tp_axis, name="core")
        _, outs = core(carry0, (frame_seq, use_frame, teacher_seq, use_teacher))

        preds = outs[t_in - 1:t_in - 1 + t_out]                     # [T_out,B,H,W,C]
        return jnp.transpose(preds, (1, 0, 4, 2, 3)).astype(jnp.float32)
