"""Segment Anything Model (SAM) core modules, TPU-first flax.

Re-implements the capability of reference models/sam/modules/{encoders.py,
decoders.py, transformer.py, blocks.py} as idiomatic NHWC flax with fully
static shapes:

- ImageEncoderViT (reference encoders.py:23): windowed + global attention
  blocks with decomposed relative positions (blocks.py:877 Block,
  blocks.py:974 REAttention). Window partition uses static pads so the
  whole encoder is one XLA program; attention matmuls run on the MXU in
  bf16 with f32 softmax.
- PromptEncoder (reference encoders.py:165): points/boxes/masks unified
  into ONE static (B, P) labelled-point tensor — boxes are two points with
  labels 2/3, padding has label -1 — so prompt embedding is a masked gather,
  not data-dependent concatenation.
- TwoWayTransformer + MaskDecoder (reference transformer.py:12,
  decoders.py:11): token<->image cross attention and hypernetwork mask
  heads, shapes fixed by (num_prompts, tokens).

Parameter naming mirrors the torch module tree so reference SAM ``.pt``
checkpoints convert through utils/torch_weights.convert_state_dict.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


class LayerNorm2d(nn.Module):
    """Channelwise LN over NHWC maps (reference nn/modules/transformer.py:193)."""

    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="ln")(x)


class MLPBlock(nn.Module):
    """lin1 -> act -> lin2 (reference transformer.py:159). The SAM ViT blocks
    use GELU; the TwoWayTransformer passes ReLU (transformer.py:47)."""

    mlp_dim: int
    out_dim: int
    act: str = "gelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x)
        x = nn.relu(x) if self.act == "relu" else nn.gelu(x, approximate=False)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="lin2")(x)


class MLP(nn.Module):
    """MLP with torch ``layers.<i>`` naming (transformer.py MLP); default
    ReLU, Hiera blocks pass GELU."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid: bool = False
    act: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.gelu(x, approximate=False) if self.act == "gelu" else nn.relu(x)
        return jax.nn.sigmoid(x) if self.sigmoid else x


# --------------------------------------------------------------------------
# image encoder (ViT)
# --------------------------------------------------------------------------


def _rel_pos_table(rel_pos: Array, size: int) -> Array:
    """(2*size-1, hd) table -> (size, size, hd) gathered by relative offset
    (static-shape form of reference utils.py:196 get_rel_pos; q==k here)."""
    idx = jnp.arange(size)[:, None] - jnp.arange(size)[None, :] + (size - 1)
    return rel_pos[idx]


class REAttention(nn.Module):
    """MHSA with decomposed relative positions (reference blocks.py:974).

    Operates on (B, H, W, C) token maps; rel-pos contributions are two
    einsum'd rank-1 terms added to the logits (utils.py:238
    add_decomposed_rel_pos), computed in f32.
    """

    dim: int
    num_heads: int
    use_rel_pos: bool
    input_size: Tuple[int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, _ = x.shape
        nh = self.num_heads
        hd = self.dim // nh
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, nh, hd)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        # (B, HW, nh, hd) -> (B, nh, HW, hd)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        attn = jnp.einsum("bnqc,bnkc->bnqk", q * (hd**-0.5), k, preferred_element_type=jnp.float32)
        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros, (2 * self.input_size[0] - 1, hd))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros, (2 * self.input_size[1] - 1, hd))
            Rh = _rel_pos_table(rel_h.astype(jnp.float32), H)  # (H, H, hd)
            Rw = _rel_pos_table(rel_w.astype(jnp.float32), W)
            rq = q.astype(jnp.float32).reshape(B, nh, H, W, hd)
            bias_h = jnp.einsum("bnhwc,hkc->bnhwk", rq, Rh)
            bias_w = jnp.einsum("bnhwc,wkc->bnhwk", rq, Rw)
            attn = attn.reshape(B, nh, H, W, H, W)
            attn = attn + bias_h[..., None] + bias_w[..., :, None, :]
            attn = attn.reshape(B, nh, H * W, H * W)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnqk,bnkc->bnqc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


def window_partition(x: Array, ws: int) -> Tuple[Array, Tuple[int, int]]:
    """(B, H, W, C) -> (B*nw, ws, ws, C) with static zero pads
    (reference utils.py:126)."""
    B, H, W, C = x.shape
    ph, pw = (-H) % ws, (-W) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, C), (Hp, Wp)


def window_unpartition(win: Array, ws: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]) -> Array:
    """Inverse of window_partition (reference utils.py:158)."""
    Hp, Wp = pad_hw
    H, W = hw
    B = win.shape[0] // (Hp // ws * Wp // ws)
    x = win.reshape(B, Hp // ws, Wp // ws, ws, ws, -1).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class ViTBlock(nn.Module):
    """Pre-LN transformer block with optional windowed attention
    (reference blocks.py:877 Block)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    use_rel_pos: bool = True
    window_size: int = 0
    input_size: Tuple[int, int] = (64, 64)
    ln_eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        shortcut = x
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")(x)
        ws = self.window_size
        if ws > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, ws)
        attn_size = (ws, ws) if ws > 0 else self.input_size
        x = REAttention(
            self.dim, self.num_heads, self.use_rel_pos, attn_size, dtype=self.dtype, name="attn"
        )(x)
        if ws > 0:
            x = window_unpartition(x, ws, pad_hw, (H, W))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm2")(x)
        return x + MLPBlock(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype, name="mlp")(y)


class ImageEncoderViT(nn.Module):
    """ViT image encoder producing a (B, H/16, W/16, out_chans) embedding
    (reference encoders.py:23)."""

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    use_abs_pos: bool = True
    use_rel_pos: bool = True
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = ()
    pretrain_img_size: int = 1024  # abs-pos table resolution (ckpt layout)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        grid = self.img_size // self.patch_size
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), dtype=self.dtype, name="patch_embed_proj",
        )(x)
        if self.use_abs_pos:
            # pretrain table is 1024/16 = 64x64; nearest-resize for other
            # sizes (reference F.interpolate default mode)
            pgrid = self.pretrain_img_size // self.patch_size
            pe = self.param("pos_embed", nn.initializers.zeros, (1, pgrid, pgrid, self.embed_dim))
            if grid != pgrid:
                pe = jax.image.resize(pe, (1, grid, grid, self.embed_dim), "nearest")
            x = x + pe.astype(x.dtype)
        for i in range(self.depth):
            x = ViTBlock(
                self.embed_dim,
                self.num_heads,
                self.mlp_ratio,
                self.use_rel_pos,
                window_size=0 if i in self.global_attn_indexes else self.window_size,
                input_size=(grid, grid),
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype, name="neck_0")(x)
        x = LayerNorm2d(dtype=self.dtype, name="neck_1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="neck_2")(x)
        return LayerNorm2d(dtype=self.dtype, name="neck_3")(x)


# --------------------------------------------------------------------------
# prompt encoder
# --------------------------------------------------------------------------


def _pe_encode(coords: Array, gauss: Array) -> Array:
    """[0,1]-normalized coords -> random-Fourier features
    (reference blocks.py:847 PositionEmbeddingRandom._pe_encoding)."""
    c = (2.0 * coords - 1.0) @ gauss
    c = 2.0 * np.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


class PromptEncoder(nn.Module):
    """Point/box/mask prompts -> sparse + dense embeddings
    (reference encoders.py:165).

    Static-shape redesign: callers pass ONE labelled point set
    ``coords (B, P, 2)`` (pixel units) + ``labels (B, P)`` where labels
    follow the reference convention — 1 foreground, 0 background,
    2/3 box corners, -1 padding. Padded slots contribute the
    ``not_a_point`` embedding exactly like reference _embed_points.
    """

    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    dtype: Any = jnp.float32

    def setup(self):
        init = nn.initializers.normal(1.0)
        self.gauss = self.param(
            "pe_layer_positional_encoding_gaussian_matrix", init, (2, self.embed_dim // 2)
        )
        self.emb_table = [
            self.param(f"point_embeddings_{i}", init, (1, self.embed_dim)) for i in range(4)
        ]
        self.not_a_point = self.param("not_a_point_embed", init, (1, self.embed_dim))
        self.no_mask = self.param("no_mask_embed", init, (1, self.embed_dim))
        self.mask_downscaling_0 = nn.Conv(
            self.mask_in_chans // 4, (2, 2), strides=(2, 2), dtype=self.dtype, name="mask_downscaling_0"
        )
        self.mask_downscaling_1 = LayerNorm2d(dtype=self.dtype, name="mask_downscaling_1")
        self.mask_downscaling_3 = nn.Conv(
            self.mask_in_chans, (2, 2), strides=(2, 2), dtype=self.dtype, name="mask_downscaling_3"
        )
        self.mask_downscaling_4 = LayerNorm2d(dtype=self.dtype, name="mask_downscaling_4")
        self.mask_downscaling_6 = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="mask_downscaling_6")

    def __call__(
        self,
        coords: Array,  # (B, P, 2) pixels
        labels: Array,  # (B, P) int: 1/0 points, 2/3 box corners, -1 pad
        masks: Optional[Array] = None,  # (B, h4, w4, 1) input mask or None
    ) -> Tuple[Array, Array]:
        h, w = self.input_image_size
        pts = (coords.astype(jnp.float32) + 0.5) / jnp.asarray([w, h], jnp.float32)
        pe = _pe_encode(pts, self.gauss.astype(jnp.float32))  # (B, P, embed)
        table = jnp.concatenate([self.not_a_point] + list(self.emb_table), axis=0)  # rows: -1,0,1,2,3
        lab = jnp.clip(labels + 1, 0, 4)
        pe = jnp.where((labels == -1)[..., None], 0.0, pe)
        sparse = pe + table[lab]

        if masks is not None:
            m = self.mask_downscaling_0(masks)
            m = nn.gelu(self.mask_downscaling_1(m), approximate=False)
            m = self.mask_downscaling_3(m)
            m = nn.gelu(self.mask_downscaling_4(m), approximate=False)
            dense = self.mask_downscaling_6(m)
        else:
            eh, ew = self.image_embedding_size
            dense = jnp.broadcast_to(
                self.no_mask.reshape(1, 1, 1, -1), (coords.shape[0], eh, ew, self.embed_dim)
            )
        return sparse.astype(self.dtype), dense.astype(self.dtype)

    def dense_pe(self) -> Array:
        """Grid positional encoding, (1, eh, ew, embed) (reference get_dense_pe)."""
        eh, ew = self.image_embedding_size
        gy = (jnp.arange(eh, dtype=jnp.float32) + 0.5) / eh
        gx = (jnp.arange(ew, dtype=jnp.float32) + 0.5) / ew
        grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)  # (eh, ew, 2)
        return _pe_encode(grid, self.gauss.astype(jnp.float32))[None]


# --------------------------------------------------------------------------
# two-way transformer + mask decoder
# --------------------------------------------------------------------------


class DownsampledAttention(nn.Module):
    """Attention with optional internal-dim downsampling
    (reference transformer.py:265 Attention)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array) -> Array:
        d = self.embedding_dim // self.downsample_rate
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
        attn = jnp.einsum("bnqc,bnkc->bnqk", q / math.sqrt(hd), k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnqk,bnkc->bnqc", attn, v).transpose(0, 2, 1, 3).reshape(B, Q, d)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    """Sparse self-attn, token->image, MLP, image->token
    (reference transformer.py:152)."""

    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = DownsampledAttention(self.embedding_dim, self.num_heads, dtype=self.dtype, name="self_attn")(
                queries, queries, queries
            )
        else:
            q = queries + query_pe
            queries = queries + DownsampledAttention(
                self.embedding_dim, self.num_heads, dtype=self.dtype, name="self_attn"
            )(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DownsampledAttention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate, dtype=self.dtype,
            name="cross_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(queries)

        queries = queries + MLPBlock(self.mlp_dim, self.embedding_dim, act="relu", dtype=self.dtype, name="mlp")(queries)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DownsampledAttention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate, dtype=self.dtype,
            name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """Query<->image two-way decoder (reference transformer.py:12)."""

    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embedding: Array, image_pe: Array, point_embedding: Array):
        B, H, W, C = image_embedding.shape
        keys = image_embedding.reshape(B, H * W, C)
        key_pe = jnp.broadcast_to(image_pe.reshape(-1, H * W, C), keys.shape).astype(keys.dtype)
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim, self.num_heads, self.mlp_dim,
                self.attention_downsample_rate, skip_first_layer_pe=(i == 0),
                dtype=self.dtype, name=f"layers_{i}",
            )(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        attn_out = DownsampledAttention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate, dtype=self.dtype,
            name="final_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_final_attn")(queries + attn_out)
        return queries, keys


class MaskDecoder(nn.Module):
    """Masks + IoU scores from image/prompt embeddings (reference decoders.py:11)."""

    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    transformer_depth: int = 2
    transformer_mlp_dim: int = 2048
    transformer_num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_embeddings: Array,  # (B, eh, ew, C) — B = number of prompt sets
        image_pe: Array,  # (1, eh, ew, C)
        sparse_prompt: Array,  # (B, P, C)
        dense_prompt: Array,  # (B, eh, ew, C)
        multimask_output: bool = True,
    ) -> Tuple[Array, Array]:
        nm = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, self.transformer_dim))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0), (nm, self.transformer_dim))
        B = sparse_prompt.shape[0]
        out_tokens = jnp.broadcast_to(
            jnp.concatenate([iou_token, mask_tokens], axis=0)[None], (B, 1 + nm, self.transformer_dim)
        ).astype(sparse_prompt.dtype)
        tokens = jnp.concatenate([out_tokens, sparse_prompt], axis=1)

        src = image_embeddings + dense_prompt
        hs, keys = TwoWayTransformer(
            self.transformer_depth, self.transformer_dim, self.transformer_num_heads,
            self.transformer_mlp_dim, dtype=self.dtype, name="transformer",
        )(src, image_pe, tokens)
        iou_out = hs[:, 0]
        mask_out = hs[:, 1 : 1 + nm]

        eh, ew = src.shape[1], src.shape[2]
        up = keys.reshape(B, eh, ew, self.transformer_dim)
        up = nn.ConvTranspose(
            self.transformer_dim // 4, (2, 2), strides=(2, 2), padding="VALID", transpose_kernel=True, dtype=self.dtype, name="output_upscaling_0"
        )(up)
        up = LayerNorm2d(dtype=self.dtype, name="output_upscaling_1")(up)
        up = nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(
            self.transformer_dim // 8, (2, 2), strides=(2, 2), padding="VALID", transpose_kernel=True, dtype=self.dtype, name="output_upscaling_3"
        )(up)
        up = nn.gelu(up, approximate=False)  # (B, 4eh, 4ew, C/8)

        hyper = jnp.stack(
            [
                MLP(self.transformer_dim, self.transformer_dim // 8, 3, dtype=self.dtype,
                    name=f"output_hypernetworks_mlps_{i}")(mask_out[:, i])
                for i in range(nm)
            ],
            axis=1,
        )  # (B, nm, C/8)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper, up, preferred_element_type=jnp.float32)
        iou_pred = MLP(
            self.iou_head_hidden_dim, nm, self.iou_head_depth, dtype=self.dtype, name="iou_prediction_head"
        )(iou_out).astype(jnp.float32)
        sl = slice(1, None) if multimask_output else slice(0, 1)
        return masks[:, sl], iou_pred[:, sl]


class SAMModel(nn.Module):
    """Full SAM: image encoder + prompt encoder + mask decoder
    (reference modules/sam.py:27; forward logic lives in predict.py there,
    here as explicit methods so each stage jits separately)."""

    img_size: int = 1024
    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
    encoder_global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    encoder_window_size: int = 14
    prompt_embed_dim: int = 256
    decoder_mlp_dim: int = 2048
    decoder_num_heads: int = 8
    iou_head_hidden_dim: int = 256
    pretrain_img_size: int = 1024
    dtype: Any = jnp.float32

    def setup(self):
        grid = self.img_size // 16
        self.image_encoder = ImageEncoderViT(
            img_size=self.img_size,
            embed_dim=self.encoder_embed_dim,
            depth=self.encoder_depth,
            num_heads=self.encoder_num_heads,
            out_chans=self.prompt_embed_dim,
            window_size=self.encoder_window_size,
            global_attn_indexes=self.encoder_global_attn_indexes,
            pretrain_img_size=self.pretrain_img_size,
            dtype=self.dtype,
        )
        self.prompt_encoder = PromptEncoder(
            embed_dim=self.prompt_embed_dim,
            image_embedding_size=(grid, grid),
            input_image_size=(self.img_size, self.img_size),
            dtype=self.dtype,
        )
        self.mask_decoder = MaskDecoder(
            transformer_dim=self.prompt_embed_dim,
            transformer_mlp_dim=self.decoder_mlp_dim,
            transformer_num_heads=self.decoder_num_heads,
            iou_head_hidden_dim=self.iou_head_hidden_dim,
            dtype=self.dtype,
        )

    def __call__(self, x: Array, coords: Array, labels: Array, multimask_output: bool = True,
                 masks: Optional[Array] = None):
        """One-shot image + prompts -> (masks, iou). Mostly for init/tests;
        the predictor calls encode/decode separately to reuse embeddings."""
        emb = self.image_encoder(x)
        return self.decode(emb, coords, labels, multimask_output, masks)

    def encode(self, x: Array) -> Array:
        return self.image_encoder(x)

    def decode(self, emb: Array, coords: Array, labels: Array, multimask_output: bool = True,
               masks: Optional[Array] = None):
        sparse, dense = self.prompt_encoder(coords, labels, masks)
        pe = self.prompt_encoder.dense_pe()
        if emb.shape[0] == 1 and coords.shape[0] > 1:
            emb = jnp.broadcast_to(emb, (coords.shape[0],) + emb.shape[1:])
        return self.mask_decoder(emb, pe, sparse, dense, multimask_output)
