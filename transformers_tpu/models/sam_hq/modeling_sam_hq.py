"""SAM-HQ (reference models/sam_hq/modular_sam_hq.py): SAM with a learned
HQ output token and early-ViT feature fusion — the vision encoder keeps the
global (non-windowed) blocks' hidden states, the mask decoder compresses the
first of them and fuses it with an upscaled image-embedding branch, and the
HQ mask is predicted by its own hypernetwork (optionally combined with the
IoU-sorted SAM masks)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Conv, Embedding
from ..sam.configuration_sam import (
    SamConfig,
    SamMaskDecoderConfig,
    SamPromptEncoderConfig,
    SamVisionConfig,
)
from ..sam.modeling_sam import (
    ConvTranspose2d,
    SamChannelsFirstLayerNorm,
    SamFeedForward,
    SamImageSegmentationOutput,
    SamMaskDecoder,
    SamModel,
    SamPreTrainedModel,
    SamVisionEncoder,
)


class SamHQConfig(SamConfig):
    model_type = "sam_hq"

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        if not hasattr(self.mask_decoder_config, "vit_dim"):
            self.mask_decoder_config.vit_dim = self.vision_config.hidden_size


class SamHQVisionEncoder(SamVisionEncoder):
    def __call__(self, params, pixel_values):
        h = self.patch_embed(params["patch_embed"], pixel_values)
        if self.config.use_abs_pos:
            h = h + params["pos_embed"].astype(h.dtype)
        intermediates = []
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h)
            if i in self.config.global_attn_indexes:  # non-windowed blocks
                intermediates.append(h)
        from ..sam.modeling_sam import SamVisionEncoderOutput

        out = SamVisionEncoderOutput(last_hidden_state=self.neck(params["neck"], h))
        out.intermediate_embeddings = intermediates
        return out


class SamHQMaskDecoder(SamMaskDecoder):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        hs = config.hidden_size
        vit_dim = getattr(config, "vit_dim", hs)
        self.hq_token = Embedding(1, hs, **kw)
        self.hq_mask_mlp = SamFeedForward(hs, hs, hs // 8, 3, **kw)
        self.compress_vit_conv1 = ConvTranspose2d(vit_dim, hs, 2, 2, **kw)
        self.compress_vit_norm = SamChannelsFirstLayerNorm(hs, 1e-6, **kw)
        self.compress_vit_conv2 = ConvTranspose2d(hs, hs // 8, 2, 2, **kw)
        self.encoder_conv1 = ConvTranspose2d(hs, hs // 4, 2, 2, **kw)
        self.encoder_norm = SamChannelsFirstLayerNorm(hs // 4, 1e-6, **kw)
        self.encoder_conv2 = ConvTranspose2d(hs // 4, hs // 8, 2, 2, **kw)
        self.mask_conv1 = Conv(hs // 8, hs // 4, 3, 1, 1, **kw)
        self.mask_norm = SamChannelsFirstLayerNorm(hs // 4, 1e-6, **kw)
        self.mask_conv2 = Conv(hs // 4, hs // 8, 3, 1, 1, **kw)
        self.num_hq_tokens = self.num_mask_tokens + 1  # + the HQ token

    def __call__(self, params, image_embeddings, image_pe,
                 sparse_prompt_embeddings, dense_prompt_embeddings,
                 multimask_output, hq_token_only=False,
                 intermediate_embeddings=None):
        gelu = lambda x: jax.nn.gelu(x, approximate=False)
        b, c, h, w = image_embeddings.shape
        pb = (sparse_prompt_embeddings.shape[1]
              if sparse_prompt_embeddings is not None else 1)

        # HQ feature branch (reference :290-305)
        embed_encode = self.encoder_conv1(params["encoder_conv1"], image_embeddings)
        embed_encode = gelu(self.encoder_norm(params["encoder_norm"], embed_encode))
        embed_encode = self.encoder_conv2(params["encoder_conv2"], embed_encode)
        if intermediate_embeddings:
            vit = jnp.transpose(intermediate_embeddings[0], (0, 3, 1, 2))
            cv = self.compress_vit_conv1(params["compress_vit_conv1"], vit)
            cv = gelu(self.compress_vit_norm(params["compress_vit_norm"], cv))
            cv = self.compress_vit_conv2(params["compress_vit_conv2"], cv)
            hq_features = embed_encode + cv
        else:
            hq_features = embed_encode

        out_tokens = jnp.concatenate([params["iou_token"]["weight"],
                                      params["mask_tokens"]["weight"],
                                      params["hq_token"]["weight"]], axis=0)
        out_tokens = jnp.broadcast_to(out_tokens[None, None],
                                      (b, pb, *out_tokens.shape)).astype(self.dtype)
        if sparse_prompt_embeddings is not None:
            tokens = jnp.concatenate(
                [out_tokens, sparse_prompt_embeddings.astype(self.dtype)], axis=2)
        else:
            tokens = out_tokens

        img = image_embeddings + dense_prompt_embeddings
        img = jnp.repeat(img, pb, axis=0)
        pe = jnp.repeat(image_pe, pb, axis=0)
        point_embedding, keys = self.transformer(params["transformer"], tokens, img, pe)
        iou_token_out = point_embedding[:, :, 0]
        mask_tokens_out = point_embedding[:, :, 1:1 + self.num_hq_tokens]

        keys = keys[:, 0].transpose(0, 2, 1).reshape(b * pb, c, h, w)
        up = self.upscale_conv1(params["upscale_conv1"], keys)
        up = gelu(self.upscale_layer_norm(params["upscale_layer_norm"], up))
        up = gelu(self.upscale_conv2(params["upscale_conv2"], up))
        up_hq = self.mask_conv1(params["mask_conv1"], up)
        up_hq = gelu(self.mask_norm(params["mask_norm"], up_hq))
        up_hq = self.mask_conv2(params["mask_conv2"], up_hq)
        hq_rep = jnp.repeat(hq_features, pb, axis=0) if hq_features.shape[0] != up_hq.shape[0] else hq_features
        up_hq = up_hq + hq_rep

        hypers = []
        for i in range(self.num_hq_tokens):
            if i < self.num_hq_tokens - 1:
                mlp = self.output_hypernetworks_mlps[i]
                sub = params["output_hypernetworks_mlps"][str(i)]
            else:
                mlp, sub = self.hq_mask_mlp, params["hq_mask_mlp"]
            hypers.append(mlp(sub, mask_tokens_out[:, :, i]))
        hyper = jnp.stack(hypers, axis=2)
        _, cu, hu, wu = up.shape
        up = up.reshape(b, pb, cu, hu * wu)
        up_hq = up_hq.reshape(b, pb, cu, hu * wu)
        masks_sam = (hyper[:, :, :-1] @ up).reshape(b, pb, -1, hu, wu)
        masks_hq = (hyper[:, :, -1:] @ up_hq).reshape(b, pb, -1, hu, wu)
        iou_pred = self.iou_prediction_head(params["iou_prediction_head"], iou_token_out)

        if multimask_output:
            iou_sel = iou_pred[:, :, 1:self.num_hq_tokens - 1]
            order = jnp.argsort(-iou_sel, axis=2)
            iou_out = jnp.take_along_axis(iou_sel, order, axis=2)
            sel = masks_sam[:, :, 1:]
            sel = jnp.take_along_axis(sel, order[..., None, None], axis=2)
        else:
            iou_out = iou_pred[:, :, 0:1]
            sel = masks_sam[:, :, 0:1]
        masks = masks_hq if hq_token_only else sel + masks_hq
        return masks, iou_out


class SamHQPreTrainedModel(SamPreTrainedModel):
    config_class = SamHQConfig


class SamHQModel(SamModel):
    config_class = SamHQConfig

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.vision_encoder = SamHQVisionEncoder(config.vision_config, **kw)
        self.mask_decoder = SamHQMaskDecoder(config.mask_decoder_config, **kw)

    def __call__(self, params, pixel_values=None, input_points=None,
                 input_labels=None, input_boxes=None, input_masks=None,
                 image_embeddings=None, intermediate_embeddings=None,
                 multimask_output=True, hq_token_only=False, **kwargs):
        if image_embeddings is None:
            enc = self.vision_encoder(params["vision_encoder"], pixel_values)
            image_embeddings = enc.last_hidden_state
            intermediate_embeddings = enc.intermediate_embeddings
        batch_size = image_embeddings.shape[0]
        image_pe = self.image_wide_pe(params, batch_size)
        if input_points is not None and input_labels is None:
            input_labels = jnp.ones(input_points.shape[:3], jnp.int32)
        sparse, dense = self.prompt_encoder(
            params["prompt_encoder"], self.shared_image_embedding,
            params["shared_image_embedding"], input_points, input_labels,
            input_boxes, input_masks, batch_size)
        masks, iou = self.mask_decoder(
            params["mask_decoder"], image_embeddings, image_pe, sparse, dense,
            multimask_output, hq_token_only=hq_token_only,
            intermediate_embeddings=intermediate_embeddings)
        return SamImageSegmentationOutput(iou_scores=iou, pred_masks=masks)
