"""SAM2 video tracking: rotary memory attention + memory encoder
(reference models/sam/modules/memory_attention.py, blocks.py RoPEAttention/
MaskDownSampler/CXBlock/Fuser, encoders.py MemoryEncoder, sam.py SAM2Model
track_step memory conditioning).

TPU-first shape discipline: the memory bank is a FIXED-SIZE ring of
``num_maskmem`` slots (empty slots masked out of the cross-attention), so
every frame of a video runs the same compiled program. RoPE tables are
static per feature size. Past-frame OBJECT POINTERS (sam-token projections
with a fixed no-object blend) ride along as extra memory tokens excluded
from RoPE, completing the reference's use_obj_ptrs_in_encoder mechanism.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bsyolo_tpu.models.sam.modules import MLP, LayerNorm2d
from bsyolo_tpu.models.sam.sam2 import SAM2Model, position_embedding_sine

Array = jax.Array


# --------------------------------------------------------------------------
# rotary attention (reference blocks.py:405 RoPEAttention)
# --------------------------------------------------------------------------


def compute_axial_cis(dim: int, end_x: int, end_y: int, theta: float = 10000.0) -> np.ndarray:
    """(end_x*end_y, dim/2) complex rotary table (reference utils.py:82)."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4)[: dim // 4].astype(np.float64) / dim))
    t = np.arange(end_x * end_y, dtype=np.float64)
    tx, ty = t % end_x, np.floor(t / end_x)
    fx = np.outer(tx, freqs)
    fy = np.outer(ty, freqs)
    return np.concatenate([np.exp(1j * fx), np.exp(1j * fy)], axis=-1)


def _apply_rope(x: Array, cis: Array) -> Array:
    """Rotate (B, H, N, D) by the (N, D/2) complex table."""
    xr = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    xc = jax.lax.complex(xr[..., 0], xr[..., 1])
    out = xc * cis[None, None]
    return jnp.stack([jnp.real(out), jnp.imag(out)], axis=-1).reshape(x.shape).astype(x.dtype)


class RoPEAttention(nn.Module):
    """Attention with axial rotary position encodings
    (reference blocks.py:405). ``rope_k_repeat`` tiles the query table along
    the key axis for cross-attention to multi-frame memories."""

    embedding_dim: int
    num_heads: int
    kv_in_dim: Optional[int] = None
    rope_k_repeat: bool = False
    rope_theta: float = 10000.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array, num_k_exclude_rope: int = 0) -> Array:
        d = self.embedding_dim
        nh = self.num_heads
        hd = d // nh
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(q)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(k)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(v)
        B, Q, _ = q.shape
        K = k.shape[1]
        q = q.reshape(B, Q, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, K, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, K, nh, hd).transpose(0, 2, 1, 3)

        side = int(math.sqrt(Q))
        cis = jnp.asarray(compute_axial_cis(hd, side, side, self.rope_theta), jnp.complex64)
        num_k_rope = K - num_k_exclude_rope
        q = _apply_rope(q, cis)
        if num_k_rope > 0:
            k_cis = cis
            if self.rope_k_repeat and num_k_rope != Q:
                k_cis = jnp.tile(cis, (num_k_rope // Q, 1))
            k_rot = _apply_rope(k[:, :, :num_k_rope], k_cis)
            k = jnp.concatenate([k_rot, k[:, :, num_k_rope:]], axis=2) if num_k_exclude_rope else k_rot

        attn = jnp.einsum("bhqc,bhkc->bhqk", q / math.sqrt(hd), k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v).transpose(0, 2, 1, 3).reshape(B, Q, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


# --------------------------------------------------------------------------
# memory attention (reference memory_attention.py)
# --------------------------------------------------------------------------


class MemoryAttentionLayer(nn.Module):
    """RoPE self-attn + RoPE cross-attn to memory + FFN
    (reference memory_attention.py:7)."""

    d_model: int = 256
    dim_feedforward: int = 2048
    mem_dim: int = 64
    pos_enc_at_attn: bool = False
    pos_enc_at_cross_attn_keys: bool = True
    pos_enc_at_cross_attn_queries: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt: Array, memory: Array, pos: Optional[Array] = None,
                 query_pos: Optional[Array] = None, num_k_exclude_rope: int = 0) -> Array:
        t2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt)
        qk = t2 + query_pos if (self.pos_enc_at_attn and query_pos is not None) else t2
        sa = RoPEAttention(self.d_model, 1, dtype=self.dtype, name="self_attn")(qk, qk, t2)
        tgt = tgt + sa

        t2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt)
        q = t2 + query_pos if (self.pos_enc_at_cross_attn_queries and query_pos is not None) else t2
        k = memory + pos if (self.pos_enc_at_cross_attn_keys and pos is not None) else memory
        ca = RoPEAttention(
            self.d_model, 1, kv_in_dim=self.mem_dim, rope_k_repeat=True,
            dtype=self.dtype, name="cross_attn_image",
        )(q, k, memory, num_k_exclude_rope=num_k_exclude_rope)
        tgt = tgt + ca

        t2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt)
        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(t2)
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(nn.relu(ff))
        return tgt + ff


class MemoryAttention(nn.Module):
    """Stack of memory attention layers + final LN
    (reference memory_attention.py:110; sam2 config: 4 layers,
    pos_enc_at_input=True)."""

    d_model: int = 256
    num_layers: int = 4
    dim_feedforward: int = 2048
    mem_dim: int = 64
    pos_enc_at_input: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, curr: Array, memory: Array, curr_pos: Optional[Array] = None,
                 memory_pos: Optional[Array] = None, num_obj_ptr_tokens: int = 0) -> Array:
        out = curr
        if self.pos_enc_at_input and curr_pos is not None:
            out = out + 0.1 * curr_pos
        for i in range(self.num_layers):
            out = MemoryAttentionLayer(
                self.d_model, self.dim_feedforward, self.mem_dim, dtype=self.dtype,
                name=f"layers_{i}",
            )(out, memory, pos=memory_pos, query_pos=curr_pos,
              num_k_exclude_rope=num_obj_ptr_tokens)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(out)


# --------------------------------------------------------------------------
# memory encoder (reference encoders.py:378 + blocks.py MaskDownSampler/
# CXBlock/Fuser)
# --------------------------------------------------------------------------


class MaskDownSampler(nn.Module):
    """Mask (1ch, image res) -> (embed_dim, res/16) via 4 stride-2 convs
    (reference blocks.py:54; sam2 config k3 s2 p1)."""

    embed_dim: int = 256
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    total_stride: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        num_layers = int(math.log2(self.total_stride) // math.log2(self.stride))
        c = 1
        idx = 0
        for _ in range(num_layers):
            c = c * self.stride**2
            x = nn.Conv(
                c, (self.kernel_size, self.kernel_size), strides=(self.stride, self.stride),
                padding=self.padding, dtype=self.dtype, name=f"encoder_{idx}",
            )(x)
            x = LayerNorm2d(dtype=self.dtype, name=f"encoder_{idx + 1}")(x)
            x = nn.gelu(x, approximate=False)
            idx += 3
        return nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name=f"encoder_{idx}")(x)


class CXBlock(nn.Module):
    """ConvNeXt block with layer scale (reference blocks.py:114)."""

    dim: int
    kernel_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        p = self.kernel_size // 2
        inp = x
        x = nn.Conv(
            self.dim, (self.kernel_size, self.kernel_size), padding=p,
            feature_group_count=self.dim, dtype=self.dtype, name="dwconv",
        )(x)
        x = LayerNorm2d(dtype=self.dtype, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,))
        return inp + gamma.astype(x.dtype) * x


class MemoryEncoder(nn.Module):
    """(pixel features s16, mask logits) -> 64-ch memory features + sine pos
    (reference encoders.py:378; sam2 config out_dim=64, 2 CXBlock fuser)."""

    out_dim: int = 64
    in_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pix_feat: Array, masks: Array, skip_mask_sigmoid: bool = False):
        if not skip_mask_sigmoid:
            masks = jax.nn.sigmoid(masks)
        m = MaskDownSampler(self.in_dim, dtype=self.dtype, name="mask_downsampler")(masks)
        x = nn.Conv(self.in_dim, (1, 1), dtype=self.dtype, name="pix_feat_proj")(pix_feat)
        x = x + m
        for i in range(2):
            x = CXBlock(self.in_dim, dtype=self.dtype, name=f"fuser_layers_{i}")(x)
        if self.out_dim != self.in_dim:
            x = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="out_proj")(x)
        pos = position_embedding_sine(x.shape[1], x.shape[2], self.out_dim).astype(x.dtype)
        return x, pos


# --------------------------------------------------------------------------
# video model + streaming predictor
# --------------------------------------------------------------------------


class SAM2VideoModel(SAM2Model):
    """SAM2 image model + memory branch (reference SAM2Model video heads:
    sigmoid-scaled mask memory, no-memory embedding, temporal slot codes)."""

    num_maskmem: int = 7
    mem_dim: int = 64
    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0

    def setup(self):
        super().setup()
        self.memory_attention = MemoryAttention(
            d_model=self.prompt_embed_dim, mem_dim=self.mem_dim, dtype=self.dtype,
            name="memory_attention",
        )
        self.memory_encoder = MemoryEncoder(
            out_dim=self.mem_dim, in_dim=self.prompt_embed_dim, dtype=self.dtype,
            name="memory_encoder",
        )
        init = nn.initializers.normal(0.02)
        self.no_mem_embed = self.param("no_mem_embed", init, (1, 1, self.prompt_embed_dim))
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc", init, (self.num_maskmem, 1, 1, self.mem_dim)
        )
        # object pointers (reference sam.py use_obj_ptrs_in_encoder=True):
        # sam output token -> 256-d pointer; no-object frames blend toward a
        # learned no_obj_ptr (fixed_no_obj_ptr)
        self.obj_ptr_proj = MLP(self.prompt_embed_dim, self.prompt_embed_dim, 3,
                                dtype=self.dtype, name="obj_ptr_proj")
        self.no_obj_ptr = self.param("no_obj_ptr", init, (1, self.prompt_embed_dim))

    def __call__(self, x: Array, coords: Array, labels: Array,
                 multimask_output: bool = True, masks: Optional[Array] = None):
        """Init/tests entry exercising ALL branches incl. the memory ones
        (so model.init creates memory_attention/memory_encoder params)."""
        emb, s0, s1 = self.encode(x)
        B, g1, g2, C = emb.shape
        S = self.num_maskmem
        bank = jnp.zeros((S, B, g1, g2, self.mem_dim), jnp.float32)
        pos = jnp.zeros((S, B, g1, g2, self.mem_dim), jnp.float32)
        valid = jnp.zeros((S,), jnp.float32)
        ptrs = jnp.zeros((S, B, C), jnp.float32)
        emb = self.condition_features(emb, bank, pos, valid, ptrs,
                                      jnp.arange(S, dtype=jnp.float32))
        out = self.decode(emb, s0, s1, coords, labels, multimask_output, masks)
        self.compute_obj_ptr(out[3], out[2])
        # touch the memory encoder with the predicted mask
        m = jax.image.resize(
            out[0][:, :1].astype(jnp.float32), (B, 1, self.img_size, self.img_size), "bilinear"
        )
        self.encode_memory(emb, jnp.moveaxis(m, 1, -1))
        return out

    def compute_obj_ptr(self, sam_token: Array, obj_logits: Array) -> Array:
        """(B, C) token + (B, 1) logits -> (B, C) pointer (reference
        _forward_sam_heads: hard lambda = obj_logits > 0, fixed no-obj blend)."""
        ptr = self.obj_ptr_proj(sam_token)
        lam = (obj_logits > 0).astype(ptr.dtype)
        return lam * ptr + (1.0 - lam) * self.no_obj_ptr.astype(ptr.dtype)

    def encode_memory(self, emb: Array, mask_logits: Array):
        """Current frame features (B, g, g, C) + predicted mask logits at
        image resolution NHWC (B, 16g, 16g, 1) -> (mem (B, g, g, 64), pos).
        Applies the reference's sigmoid scale/bias (track_step,
        sigmoid_scale_for_mem_enc=20, bias=-10)."""
        m = mask_logits * self.sigmoid_scale_for_mem_enc + self.sigmoid_bias_for_mem_enc
        return self.memory_encoder(emb, m, skip_mask_sigmoid=False)

    def condition_features(
        self,
        emb: Array,  # (B, g, g, C) current-frame s16 features
        mem_bank: Array,  # (S, B, g, g, mem_dim) ring of past memories
        mem_pos: Array,  # (S, B, g, g, mem_dim)
        mem_valid: Array,  # (S,) 1.0 for filled slots
        obj_ptrs: Optional[Array] = None,  # (S, B, C) past object pointers
        ages: Optional[Array] = None,  # (S,) frames-ago per slot (ring-aware)
    ) -> Array:
        """Cross-attend current features over the memory bank
        (reference _prepare_memory_conditioned_features). Empty bank ->
        no_mem_embed is added instead (directly_add_no_mem_embed)."""
        B, g1, g2, C = emb.shape
        S = mem_bank.shape[0]
        cur = emb.reshape(B, g1 * g2, C)
        cur_pos = position_embedding_sine(g1, g2, C).astype(emb.dtype).reshape(1, g1 * g2, C)
        cur_pos = jnp.broadcast_to(cur_pos, cur.shape)

        any_valid = jnp.sum(mem_valid) > 0
        if ages is None:
            ages = jnp.arange(S, dtype=jnp.float32)
        # memory tokens: (B, S*g*g, mem_dim); temporal codes indexed by
        # RECENCY (frames-ago), not ring-slot position — the ring rotates,
        # the age of a slot does not follow its index
        mem = mem_bank.transpose(1, 0, 2, 3, 4).reshape(B, S * g1 * g2, self.mem_dim)
        age_idx = jnp.clip(ages, 0, self.num_maskmem - 1).astype(jnp.int32)
        tpos = self.maskmem_tpos_enc[age_idx][:, None]  # (S, 1, 1, 1, D)
        pos = (mem_pos + tpos).transpose(1, 0, 2, 3, 4).reshape(B, S * g1 * g2, self.mem_dim)
        # mask empty slots: zero their keys/values (softmax still sees them,
        # but with rope'd zero keys their logits are uniform noise-free)
        valid = jnp.repeat(mem_valid, g1 * g2)[None, :, None]
        mem = mem * valid
        pos = pos * valid

        n_ptr_tokens = 0
        if obj_ptrs is not None:
            # past pointers as extra memory tokens: each 256-d pointer splits
            # into C/mem_dim tokens of mem_dim; sine temporal codes as pos;
            # excluded from RoPE (reference _prepare_memory_conditioned_features)
            tok_per_ptr = C // self.mem_dim
            ptr_tok = (obj_ptrs * mem_valid[:, None, None]).transpose(1, 0, 2)
            ptr_tok = ptr_tok.reshape(B, S * tok_per_ptr, self.mem_dim)
            t_ages = jnp.repeat(ages / max(S, 1), tok_per_ptr)
            dim_t = 10000.0 ** (2.0 * (jnp.arange(self.mem_dim // 2) // 1) / self.mem_dim)
            ang = t_ages[:, None] / dim_t[None]
            ptr_pos = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)[None]
            ptr_pos = jnp.broadcast_to(ptr_pos, ptr_tok.shape).astype(mem.dtype)
            ptr_pos = ptr_pos * jnp.repeat(mem_valid, tok_per_ptr)[None, :, None]
            mem = jnp.concatenate([mem, ptr_tok.astype(mem.dtype)], axis=1)
            pos = jnp.concatenate([pos, ptr_pos], axis=1)
            n_ptr_tokens = S * tok_per_ptr
        attended = self.memory_attention(cur, mem, curr_pos=cur_pos, memory_pos=pos,
                                         num_obj_ptr_tokens=n_ptr_tokens)
        out = jnp.where(any_valid, attended, cur + self.no_mem_embed)
        return out.reshape(B, g1, g2, C)


class SAM2VideoPredictor:
    """Streaming tracker: prompt once, propagate through the video
    (reference predict.py SAM2VideoPredictor, simplified to a single object
    per stream and a fixed-size memory ring)."""

    def __init__(self, model: SAM2VideoModel, variables, img_size: int = 1024,
                 max_points: int = 8):
        self.model = model
        self.variables = variables
        self.img_size = img_size
        self.max_points = max_points
        g = img_size // 16
        self.grid = g
        self._encode = jax.jit(lambda v, x: model.apply(v, x, method=model.encode))
        self._decode = jax.jit(
            lambda v, emb, s0, s1, c, l: model.apply(v, emb, s0, s1, c, l, False,
                                                     method=model.decode)
        )
        self._condition = jax.jit(
            lambda v, emb, bank, pos, valid, ptrs, ages: model.apply(
                v, emb, bank, pos, valid, ptrs, ages, method=model.condition_features
            )
        )
        self._obj_ptr = jax.jit(
            lambda v, tok, ol: model.apply(v, tok, ol, method=model.compute_obj_ptr)
        )
        self._encode_mem = jax.jit(
            lambda v, emb, m: model.apply(v, emb, m, method=model.encode_memory)
        )
        self.reset()

    def reset(self):
        S, g, D = self.model.num_maskmem, self.grid, self.model.mem_dim
        self.bank = jnp.zeros((S, 1, g, g, D), jnp.float32)
        self.bank_pos = jnp.zeros((S, 1, g, g, D), jnp.float32)
        self.ptrs = jnp.zeros((S, 1, self.model.prompt_embed_dim), jnp.float32)
        self.valid = jnp.zeros((S,), jnp.float32)
        self._slot = 0

    def _preprocess(self, img: np.ndarray):
        from bsyolo_tpu.models.sam.predict import PIXEL_MEAN, PIXEL_STD
        import cv2

        h, w = img.shape[:2]
        scale = self.img_size / max(h, w)
        nh, nw = round(h * scale), round(w * scale)
        r = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        out = np.zeros((self.img_size, self.img_size, 3), np.float32)
        out[:nh, :nw] = (r.astype(np.float32) - PIXEL_MEAN) / PIXEL_STD
        return out[None], scale, (h, w), (nh, nw)

    def add_first_frame(self, img: np.ndarray, bboxes=None, points=None, labels=None):
        """Prompted segmentation on frame 0; seeds the memory bank."""
        x, scale, self._orig, self._in = self._preprocess(img)
        emb, s0, s1 = self._encode(self.variables, jnp.asarray(x))
        P = self.max_points
        c = np.zeros((1, P, 2), np.float32)
        l = -np.ones((1, P), np.int32)
        if bboxes is not None:
            b = np.asarray(bboxes, np.float32).reshape(4)
            c[0, 0], c[0, 1] = b[:2] * scale, b[2:] * scale
            l[0, 0], l[0, 1] = 2, 3
        if points is not None:
            pts = np.asarray(points, np.float32).reshape(-1, 2) * scale
            lab = np.ones(len(pts), np.int32) if labels is None else np.asarray(labels, np.int32)
            n = min(len(pts), P - 2)
            c[0, 2 : 2 + n] = pts[:n]
            l[0, 2 : 2 + n] = lab[:n]
        masks, iou, obj, tok = self._decode(self.variables, emb, s0, s1, jnp.asarray(c), jnp.asarray(l))
        self._remember(emb, masks, tok, obj)
        return self._to_numpy_mask(masks), float(iou[0, 0])

    def track(self, img: np.ndarray):
        """Propagate to the next frame using the memory bank (no prompts)."""
        x, _, self._orig, self._in = self._preprocess(img)
        emb, s0, s1 = self._encode(self.variables, jnp.asarray(x))
        S = self.model.num_maskmem
        # frames-ago per ring slot: the slot about to be written is oldest
        ages = jnp.asarray(
            [float((self._slot - 1 - i) % S) for i in range(S)], jnp.float32
        )
        cond = self._condition(self.variables, emb, self.bank, self.bank_pos,
                               self.valid, self.ptrs, ages)
        P = self.max_points
        c = jnp.zeros((1, P, 2), jnp.float32)
        l = -jnp.ones((1, P), jnp.int32)
        masks, iou, obj, tok = self._decode(self.variables, cond, s0, s1, c, l)
        self._remember(cond, masks, tok, obj)
        return self._to_numpy_mask(masks), float(iou[0, 0]), float(obj[0, 0])

    def _remember(self, emb, masks, tok=None, obj=None):
        # upscale low-res mask logits to image res for the downsampler
        m = jax.image.resize(
            masks.astype(jnp.float32), (1, 1, self.img_size, self.img_size), "bilinear"
        )
        m = jnp.moveaxis(m, 1, -1)  # (1, H, W, 1)
        mem, pos = self._encode_mem(self.variables, emb, m)
        self.bank = self.bank.at[self._slot].set(mem.astype(jnp.float32))
        self.bank_pos = self.bank_pos.at[self._slot].set(
            jnp.broadcast_to(pos, mem.shape).astype(jnp.float32)
        )
        if tok is not None:
            ptr = self._obj_ptr(self.variables, tok, obj)
            self.ptrs = self.ptrs.at[self._slot].set(ptr.astype(jnp.float32))
        self.valid = self.valid.at[self._slot].set(1.0)
        self._slot = (self._slot + 1) % self.model.num_maskmem

    def _to_numpy_mask(self, masks) -> np.ndarray:
        import cv2

        m = np.asarray(masks.astype(jnp.float32))[0, 0]
        nh, nw = self._in
        h, w = self._orig
        frac_h = int(round(m.shape[0] * nh / self.img_size))
        frac_w = int(round(m.shape[1] * nw / self.img_size))
        m = m[:frac_h, :frac_w]
        return cv2.resize(m, (w, h), interpolation=cv2.INTER_LINEAR) > 0
