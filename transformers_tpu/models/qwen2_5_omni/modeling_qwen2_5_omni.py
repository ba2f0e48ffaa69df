"""Qwen2.5-Omni Thinker (reference
models/qwen2_5_omni/modeling_qwen2_5_omni.py): the any-to-text half of the
omni model — a windowed Whisper-style audio encoder (2*n_window-frame chunks
attend block-diagonally, stride-2 conv + pairwise avg-pool :833), the
Qwen2.5-VL vision encoder with separate q/k/v projections (:996), and a
Qwen2 text stack whose 3D M-RoPE aligns audio/vision blocks on a shared
25-positions-per-second timeline (get_rope_index :220). The Talker +
DiT/BigVGAN Token2Wav speech-generation path is not modeled yet; its
weights are ignored on load and `Qwen2_5OmniForConditionalGeneration`
exposes the thinker's text generation."""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...cache_utils import cache_from_config
from ...core.module import Conv, Embedding, LayerNorm, Linear, Module, normal_init
from ...generation import GenerationMixin
from ...modeling_outputs import CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..qwen2_5_vl.modeling_qwen2_5_vl import (
    Qwen2_5_VisionTransformer,
    Qwen2_5_VLVisionBlock,
)
from ..qwen2_vl.modeling_qwen2_vl import Qwen2VLTextModel, rotate_half
from .configuration_qwen2_5_omni import (
    Qwen2_5OmniConfig,
    Qwen2_5OmniThinkerConfig,
)

NEG = float(np.finfo(np.float32).min)


# ------------------------------------------------------------- audio tower


def sinusoids_position_embedding(length, channels, max_timescale=10000):
    """reference SinusoidsPositionEmbedding:713 — [sin | cos] halves."""
    log_inc = math.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2, dtype=np.float64))
    ang = np.arange(length, dtype=np.float64)[:, None] * inv[None]
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=1).astype(np.float32)


class Qwen2_5OmniAudioAttention(Module):
    """reference :565 — pre-LN MHA over block-diagonal audio chunks; the
    block structure arrives as segment ids rendered into an additive bias."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.num_heads = config.encoder_attention_heads
        self.head_dim = d // self.num_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.k_proj = Linear(d, d, use_bias=False, **kw)
        self.v_proj = Linear(d, d, **kw)
        self.q_proj = Linear(d, d, **kw)
        self.out_proj = Linear(d, d, **kw)

    def __call__(self, params, hidden, bias):  # hidden [N, D]
        n, d = hidden.shape
        h, hd = self.num_heads, self.head_dim
        q = self.q_proj(params["q_proj"], hidden).reshape(n, h, hd)
        k = self.k_proj(params["k_proj"], hidden).reshape(n, h, hd)
        v = self.v_proj(params["v_proj"], hidden).reshape(n, h, hd)
        scores = jnp.einsum("qhd,khd->hqk", q, k,
                            preferred_element_type=jnp.float32) * hd ** -0.5
        scores = scores + bias[None]
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("hqk,khd->qhd", probs, v).reshape(n, d)
        return self.out_proj(params["out_proj"], out)


class Qwen2_5OmniAudioEncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.self_attn = Qwen2_5OmniAudioAttention(config, **kw)
        self.self_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        lkw = dict(dtype=dtype, param_dtype=param_dtype,
                   kernel_init=normal_init(config.initializer_range))
        self.fc1 = Linear(d, config.encoder_ffn_dim, **lkw)
        self.fc2 = Linear(config.encoder_ffn_dim, d, **lkw)
        self.final_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, hidden, bias):
        h = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
        hidden = hidden + self.self_attn(params["self_attn"], h, bias)
        h = self.final_layer_norm(params["final_layer_norm"], hidden)
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], h)))
        return hidden + h


class Qwen2_5OmniAudioEncoder(Module):
    """reference :833."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.conv1 = Conv(config.num_mel_bins, d, 3, padding=1, ndim=1, **kw)
        self.conv2 = Conv(d, d, 3, stride=2, padding=1, ndim=1, **kw)
        self.pos_table = sinusoids_position_embedding(
            config.max_source_positions, d)
        self.audio_bos_eos_token = Embedding(2, config.output_dim, **kw)
        self.layers = [Qwen2_5OmniAudioEncoderLayer(config, **kw)
                       for _ in range(config.encoder_layers)]
        self.ln_post = LayerNorm(d, 1e-5, **kw)
        self.proj = Linear(d, config.output_dim, **kw)
        self.n_window = config.n_window

    @staticmethod
    def feat_lengths(input_lengths):
        after_conv1 = (np.asarray(input_lengths) - 1) // 2 + 1
        return after_conv1, (after_conv1 - 2) // 2 + 1

    def __call__(self, params, input_features, feature_lens):
        """input_features [mel, total_frames] (concatenated audios);
        feature_lens [num_audios]. Host-side chunking mirrors
        chunk_and_pad_features/get_*_indices (reference :734-826)."""
        cfg = self.config
        feats = np.asarray(input_features)
        lens = np.asarray(feature_lens)
        win = self.n_window * 2
        # chunk each audio into win-frame pieces (last may be ragged)
        chunk_lengths = []
        for L in lens:
            n_full, tail = int(L) // win, int(L) % win
            chunk_lengths += [win] * n_full + ([tail] if tail else [])
        chunk_lengths = np.asarray(chunk_lengths)
        max_chunk = int(chunk_lengths.max())
        pieces = np.split(feats.T, np.cumsum(chunk_lengths)[:-1], axis=0)
        padded = np.zeros((len(pieces), max_chunk, feats.shape[0]), np.float32)
        for i, p in enumerate(pieces):
            padded[i, : p.shape[0]] = p
        padded = jnp.asarray(padded).transpose(0, 2, 1)  # [C, mel, T]

        mask = (np.arange(max_chunk)[None] < chunk_lengths[:, None])
        h = jax.nn.gelu(self.conv1(params["conv1"], padded), approximate=False)
        h = h * jnp.asarray(mask, h.dtype)[:, None, :]
        h = jax.nn.gelu(self.conv2(params["conv2"], h), approximate=False)
        h = h.transpose(0, 2, 1)  # [C, T', D]
        h = h + jnp.asarray(self.pos_table[: h.shape[1]])[None]

        after_conv1 = (chunk_lengths - 1) // 2 + 1
        max_after = int(after_conv1.max())
        valid = (np.arange(max_after)[None] < after_conv1[:, None]).reshape(-1)
        valid_idx = np.nonzero(valid)[0]
        hidden = jnp.take(h.reshape(-1, h.shape[-1]), jnp.asarray(valid_idx),
                          axis=0)

        # block-diagonal chunk mask from segment ids
        seg_ids = np.repeat(np.arange(len(chunk_lengths)), after_conv1)
        bias = jnp.where(jnp.asarray(seg_ids[:, None] == seg_ids[None, :]),
                         0.0, NEG)
        for i, layer in enumerate(self.layers):
            hidden = layer(params["layers"][str(i)], hidden, bias)

        # pairwise average pooling within each ORIGINAL audio
        a1_per_audio = (lens - 1) // 2 + 1
        n_pool = (a1_per_audio - 2) // 2 + 1
        offs = np.concatenate([[0], np.cumsum(a1_per_audio)[:-1]])
        pool_idx = np.concatenate([
            o + np.arange(n) * 2 for o, n in zip(offs, n_pool)]).astype(np.int64)
        pool_idx_j = jnp.asarray(pool_idx)
        hidden = (jnp.take(hidden, pool_idx_j, axis=0)
                  + jnp.take(hidden, pool_idx_j + 1, axis=0)) / 2
        return self.proj(params["proj"], self.ln_post(params["ln_post"], hidden))


# ------------------------------------------------------------ vision tower


class Qwen2_5OmniVisionAttention(Module):
    """reference :996 — separate q/k/v projections (Qwen2.5-VL fuses them)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_heads
        self.head_dim = config.hidden_size // config.num_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        d = config.hidden_size
        self.q = Linear(d, d, True, **kw)
        self.k = Linear(d, d, True, **kw)
        self.v = Linear(d, d, True, **kw)
        self.proj = Linear(d, d, True, **kw)

    def __call__(self, params, hidden, cos, sin, bias):
        from ...ops.attention import eager_attention

        n, e = hidden.shape
        h, hd = self.num_heads, self.head_dim
        q = self.q(params["q"], hidden).reshape(n, h, hd)
        k = self.k(params["k"], hidden).reshape(n, h, hd)
        v = self.v(params["v"], hidden).reshape(n, h, hd)
        cos_, sin_ = cos[:, None, :], sin[:, None, :]
        q = (q.astype(jnp.float32) * cos_ + rotate_half(q.astype(jnp.float32)) * sin_).astype(self.dtype)
        k = (k.astype(jnp.float32) * cos_ + rotate_half(k.astype(jnp.float32)) * sin_).astype(self.dtype)
        out = eager_attention(q[None], k[None], v[None].astype(self.dtype),
                              bias[None, None], is_causal=False,
                              scale=hd ** -0.5)[0]
        return self.proj(params["proj"], out.reshape(n, e))


class Qwen2_5OmniVisionBlock(Qwen2_5_VLVisionBlock):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.attn = Qwen2_5OmniVisionAttention(config, dtype=dtype,
                                               param_dtype=param_dtype)


class Qwen2_5OmniVisionEncoder(Qwen2_5_VisionTransformer):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.blocks = [Qwen2_5OmniVisionBlock(config, **kw)
                       for _ in range(config.depth)]


# ------------------------------------------------------------- rope index


def get_omni_rope_index(config, input_ids, image_grid_thw=None,
                        video_grid_thw=None, attention_mask=None,
                        use_audio_in_video=False, audio_seqlens=None,
                        second_per_grids=None):
    """Numpy port of the Thinker's time-aligned 3D rope indices
    (reference get_rope_index :220-517)."""
    image_token_id = config.image_token_id
    video_token_id = config.video_token_id
    audio_token_id = config.audio_token_id
    vision_start = config.vision_start_token_id
    audio_start = config.audio_start_token_id
    pps = config.position_id_per_seconds
    spc = config.seconds_per_chunk
    sms = config.vision_config.spatial_merge_size

    ids_all = np.asarray(input_ids)
    b, s = ids_all.shape

    def vision_block(st_idx, vision_idx, t_index, grid_hs, grid_ws):
        lh = int(grid_hs[vision_idx]) // sms
        lw = int(grid_ws[vision_idx]) // sms
        h_index = np.broadcast_to(np.arange(lh)[None, :, None],
                                  (len(t_index), lh, lw)).reshape(-1)
        w_index = np.broadcast_to(np.arange(lw)[None, None, :],
                                  (len(t_index), lh, lw)).reshape(-1)
        t_full = np.broadcast_to(np.asarray(t_index)[:, None],
                                 (len(t_index), lh * lw)).reshape(-1)
        return np.stack([t_full, h_index, w_index]).astype(np.int64) + st_idx

    def chunked(token_indices, per_chunk, remove_index):
        out, i, start, cur = [], 0, 0, 1
        while i < len(token_indices):
            if token_indices[i] - remove_index >= cur * per_chunk:
                out.append((start, i))
                start = i
                cur += 1
            i += 1
        out.append((start, len(token_indices)))
        return out

    if image_grid_thw is not None or video_grid_thw is not None:
        if attention_mask is None:
            attention_mask = np.ones_like(ids_all)
        attention_mask = np.asarray(attention_mask) == 1
        position_ids = np.ones((3, b, s), np.int64)
        image_idx = video_idx = audio_idx = 0
        deltas = []
        for i in range(b):
            ids = ids_all[i][attention_mask[i]]
            vis_starts = np.nonzero(ids == vision_start)[0]
            vis_tokens = ids[vis_starts + 1] if len(vis_starts) else np.array([])
            audio_nums = int((ids == audio_start).sum())
            image_nums = int((vis_tokens == image_token_id).sum())
            video_nums = (int((vis_tokens == audio_start).sum())
                          if use_audio_in_video
                          else int((vis_tokens == video_token_id).sum()))
            tokens = ids.tolist()
            pos_list = []
            st = 0
            remain_i, remain_v, remain_a = image_nums, video_nums, audio_nums
            mm_nums = (image_nums + audio_nums if use_audio_in_video
                       else image_nums + video_nums + audio_nums)

            def nxt(seq_start=0):
                return (pos_list[-1].max() + 1) if pos_list else 0

            def text_span(n):
                return np.broadcast_to(np.arange(n)[None], (3, n)) + nxt()

            for _ in range(mm_nums):
                ed_image = tokens.index(image_token_id, st) \
                    if (image_token_id in tokens[st:] and remain_i > 0) else len(tokens) + 1
                ed_video = tokens.index(video_token_id, st) \
                    if (video_token_id in tokens[st:] and remain_v > 0) else len(tokens) + 1
                ed_audio = tokens.index(audio_token_id, st) \
                    if (audio_token_id in tokens[st:] and remain_a > 0) else len(tokens) + 1
                min_ed = min(ed_image, ed_video, ed_audio)
                if min_ed == ed_audio:
                    text_len = min_ed - st - 1
                    if text_len:
                        pos_list.append(text_span(text_len))
                    pos_list.append(text_span(1))  # bos
                    audio_len = int(((audio_seqlens[audio_idx] - 1) // 2 + 1 - 2) // 2 + 1)
                    pos_list.append(text_span(audio_len))
                    pos_list.append(text_span(1))  # eos
                    st += text_len + 1 + audio_len + 1
                    audio_idx += 1
                    remain_a -= 1
                elif min_ed == ed_image:
                    text_len = min_ed - st - 1
                    if text_len:
                        pos_list.append(text_span(text_len))
                    pos_list.append(text_span(1))
                    grid_t = int(image_grid_thw[image_idx][0])
                    t_index = (np.arange(grid_t) * 1 * pps).astype(np.int64)
                    pos_list.append(vision_block(
                        nxt(), image_idx, t_index,
                        np.asarray(image_grid_thw)[:, 1],
                        np.asarray(image_grid_thw)[:, 2]))
                    image_len = int(np.prod(image_grid_thw[image_idx]) // (sms ** 2))
                    pos_list.append(text_span(1))
                    st += text_len + 1 + image_len + 1
                    image_idx += 1
                    remain_i -= 1
                elif min_ed == ed_video and not use_audio_in_video:
                    text_len = min_ed - st - 1
                    if text_len:
                        pos_list.append(text_span(text_len))
                    pos_list.append(text_span(1))
                    grid_t = int(video_grid_thw[video_idx][0])
                    spg = float(second_per_grids[video_idx]) \
                        if second_per_grids is not None else 1.0
                    t_index = (np.arange(grid_t) * spg * pps).astype(np.int64)
                    pos_list.append(vision_block(
                        nxt(), video_idx, t_index,
                        np.asarray(video_grid_thw)[:, 1],
                        np.asarray(video_grid_thw)[:, 2]))
                    video_len = int(np.prod(video_grid_thw[video_idx]) // (sms ** 2))
                    pos_list.append(text_span(1))
                    st += text_len + 1 + video_len + 1
                    video_idx += 1
                    remain_v -= 1
                else:  # video with interleaved audio
                    text_len = min_ed - st - 2
                    if text_len:
                        pos_list.append(text_span(text_len))
                    bos = text_span(1)
                    pos_list.append(bos)
                    pos_list.append(bos.copy())
                    st_idx = nxt()
                    audio_len = int(((audio_seqlens[audio_idx] - 1) // 2 + 1 - 2) // 2 + 1)
                    audio_pos = np.broadcast_to(
                        np.arange(audio_len)[None], (3, audio_len)) + st_idx
                    grid_t = int(video_grid_thw[video_idx][0])
                    spg = float(second_per_grids[video_idx]) \
                        if second_per_grids is not None else 1.0
                    t_index = (np.arange(grid_t) * spg * pps).astype(np.int64)
                    video_pos = vision_block(
                        st_idx, video_idx, t_index,
                        np.asarray(video_grid_thw)[:, 1],
                        np.asarray(video_grid_thw)[:, 2])
                    per_chunk = int(pps * spc)
                    v_chunks = chunked(video_pos[0], per_chunk, st_idx)
                    a_chunks = chunked(audio_pos[0], per_chunk, st_idx)
                    for j in range(max(len(v_chunks), len(a_chunks))):
                        if j < len(v_chunks):
                            c0, c1 = v_chunks[j]
                            pos_list.append(video_pos[:, c0:c1])
                        if j < len(a_chunks):
                            c0, c1 = a_chunks[j]
                            pos_list.append(audio_pos[:, c0:c1])
                    video_len = int(np.prod(video_grid_thw[video_idx]) // (sms ** 2))
                    eos = text_span(1)
                    pos_list.append(eos)
                    pos_list.append(eos.copy())
                    st += text_len + 2 + audio_len + video_len + 2
                    audio_idx += 1
                    video_idx += 1
                    remain_v -= 1
                    remain_a -= 1
            if st < len(tokens):
                pos_list.append(text_span(len(tokens) - st))
            llm_positions = np.concatenate(pos_list, axis=1).reshape(3, -1)
            position_ids[:, i, attention_mask[i]] = llm_positions
            deltas.append(int(llm_positions.max()) + 1 - ids_all.shape[1])
        return position_ids, np.asarray(deltas)[:, None]
    else:
        if attention_mask is None:
            attention_mask = np.ones_like(ids_all)
        mask = np.asarray(attention_mask)
        pos = np.cumsum(mask, axis=-1) - 1
        pos[mask == 0] = 1
        position_ids = np.broadcast_to(pos[None], (3, b, s)).copy()
        max_pos = position_ids.max(axis=(0, 2), keepdims=False)
        deltas = (max_pos + 1 - mask.sum(-1))[:, None]
        return position_ids, deltas


# -------------------------------------------------------------- the thinker


class Qwen2_5OmniPreTrainedModel(PreTrainedModel):
    config_class = Qwen2_5OmniThinkerConfig
    base_model_prefix = "thinker"


class Qwen2_5OmniThinkerForConditionalGeneration(Qwen2_5OmniPreTrainedModel,
                                                 GenerationMixin):
    _prefill_input_names = ("pixel_values", "pixel_values_videos",
                            "input_features", "feature_attention_mask")
    _static_prefill_input_names = ("image_grid_thw", "video_grid_thw")

    def __init__(self, config: Qwen2_5OmniThinkerConfig, *, dtype=jnp.float32,
                 param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.audio_tower = Qwen2_5OmniAudioEncoder(config.audio_config, **kw)
        self.visual = Qwen2_5OmniVisionEncoder(config.vision_config, **kw)
        self.model = Qwen2VLTextModel(config.text_config, **kw)
        tc = config.text_config
        if not tc.tie_word_embeddings:
            self.lm_head = Linear(tc.hidden_size, tc.vocab_size, False,
                                  kernel_init=normal_init(0.02), **kw)

    def get_input_embedding_path(self):
        return "model.embed_tokens.weight"

    def compute_logits(self, params, hidden):
        if self.config.text_config.tie_word_embeddings:
            return self.model.embed_tokens.attend(
                params["model"]["embed_tokens"], hidden)
        return self.lm_head(params["lm_head"], hidden)

    def get_audio_features(self, params, input_features,
                           feature_attention_mask=None):
        feats = np.asarray(input_features)
        if feature_attention_mask is not None:
            fam = np.asarray(feature_attention_mask).astype(bool)
            lens = fam.sum(1)
            feats = np.concatenate(
                [feats[i][:, fam[i]] for i in range(feats.shape[0])], axis=1)
        else:
            lens = np.asarray([feats.shape[-1]] * feats.shape[0])
            feats = np.concatenate(list(feats), axis=1)
        return self.audio_tower(params["audio_tower"], feats, lens)

    def _embed(self, params, input_ids, input_features, feature_attention_mask,
               pixel_values, image_grid_thw, pixel_values_videos,
               video_grid_thw):
        cfg = self.config
        specials = (cfg.audio_token_id, cfg.image_token_id, cfg.video_token_id)
        clean = input_ids
        for tok in specials:
            clean = jnp.where(input_ids == tok, 0, clean)
        embeds = self.model.embed_tokens(params["model"]["embed_tokens"], clean)

        def scatter(embeds, feats, token):
            mask = input_ids == token
            order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
            placed = jnp.take(feats.astype(embeds.dtype),
                              jnp.clip(order, 0, feats.shape[0] - 1),
                              axis=0).reshape(embeds.shape)
            return jnp.where(mask[..., None], placed, embeds)

        if input_features is not None:
            audio = self.get_audio_features(params, input_features,
                                            feature_attention_mask)
            embeds = scatter(embeds, audio, cfg.audio_token_id)
        if pixel_values is not None:
            feats = self.visual(params["visual"], pixel_values,
                                np.asarray(image_grid_thw))
            embeds = scatter(embeds, feats, cfg.image_token_id)
        if pixel_values_videos is not None:
            feats = self.visual(params["visual"], pixel_values_videos,
                                np.asarray(video_grid_thw))
            embeds = scatter(embeds, feats, cfg.video_token_id)
        return embeds

    def _prepare_generation_positions(self, input_ids, attention_mask,
                                      **model_kwargs):
        fam = model_kwargs.get("feature_attention_mask")
        audio_lens = None if fam is None else np.asarray(fam).sum(-1)
        pos, deltas = get_omni_rope_index(
            self.config, np.asarray(input_ids),
            model_kwargs.get("image_grid_thw"),
            model_kwargs.get("video_grid_thw"),
            np.asarray(attention_mask),
            model_kwargs.get("use_audio_in_video", False),
            audio_lens, model_kwargs.get("second_per_grids"))
        s = input_ids.shape[1]
        rope_last = (deltas[:, 0] + s - 1).astype(np.int32)
        return jnp.asarray(pos, jnp.int32), jnp.asarray(rope_last)

    def __call__(self, params, input_ids=None, input_features=None,
                 pixel_values=None, pixel_values_videos=None,
                 image_grid_thw=None, video_grid_thw=None,
                 feature_attention_mask=None, attention_mask=None,
                 position_ids=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, labels=None, use_audio_in_video=False,
                 second_per_grids=None, logits_to_keep: int = 0,
                 output_hidden_states=False, **kwargs) -> CausalLMOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self._embed(
                params, input_ids, input_features, feature_attention_mask,
                pixel_values, image_grid_thw, pixel_values_videos,
                video_grid_thw)
        if position_ids is None and input_ids is not None and past_key_values is None:
            fam = feature_attention_mask
            audio_lens = None if fam is None else np.asarray(fam).sum(-1)
            pos, _ = get_omni_rope_index(
                self.config, np.asarray(input_ids),
                None if image_grid_thw is None else np.asarray(image_grid_thw),
                None if video_grid_thw is None else np.asarray(video_grid_thw),
                None if attention_mask is None else np.asarray(attention_mask),
                use_audio_in_video, audio_lens,
                None if second_per_grids is None else np.asarray(second_per_grids))
            position_ids = jnp.asarray(pos)
        outputs = self.model(params["model"], None, attention_mask,
                             position_ids, past_key_values, cache_position,
                             inputs_embeds, output_hidden_states)
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels,
                                      self.config.text_config.vocab_size)
        return CausalLMOutputWithPast(loss=loss, logits=logits,
                                      past_key_values=outputs.past_key_values,
                                      hidden_states=outputs.hidden_states)

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        return cache_from_config(self.config.text_config, batch_size, max_len,
                                 dtype or self.dtype,
                                 implementation=implementation)


class Qwen2_5OmniForConditionalGeneration(PreTrainedModel):
    """Top-level omni model. The thinker (any -> text) is fully modeled; the
    talker/token2wav speech path is not yet — their checkpoint weights are
    ignored on load and generate() returns the thinker's text."""

    config_class = Qwen2_5OmniConfig
    base_model_prefix = ""
    _keys_to_ignore_on_load_unexpected = (r"^talker\.", r"^token2wav\.")

    def __init__(self, config: Qwen2_5OmniConfig, *, dtype=jnp.float32,
                 param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.thinker = Qwen2_5OmniThinkerForConditionalGeneration(
            config.thinker_config, dtype=self.dtype,
            param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.thinker(params["thinker"], *args, **kwargs)

    def generate(self, params=None, **kwargs):
        params = params if params is not None else self.params
        return self.thinker.generate(params["thinker"], **kwargs)
