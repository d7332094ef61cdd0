"""Weight-conversion tests: a synthetic diffusers-layout state dict built
from our init tree round-trips exactly through the converter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionspatialcontrol_tpu.convert import hf
from diffusionspatialcontrol_tpu.models.clip import clip_init
from diffusionspatialcontrol_tpu.models.unet import unet_init
from diffusionspatialcontrol_tpu.models.vae import vae_init
from tests.test_pipeline import TINY


def _inv_conv(dst, name, p):
    dst[f"{name}.weight"] = np.asarray(p["kernel"], np.float32).transpose(
        3, 2, 0, 1
    )
    dst[f"{name}.bias"] = np.asarray(p["bias"], np.float32)


def _inv_linear(dst, name, p):
    dst[f"{name}.weight"] = np.asarray(p["kernel"], np.float32).T
    if "bias" in p:
        dst[f"{name}.bias"] = np.asarray(p["bias"], np.float32)


def _inv_norm(dst, name, p):
    dst[f"{name}.weight"] = np.asarray(p["scale"], np.float32)
    dst[f"{name}.bias"] = np.asarray(p["bias"], np.float32)


def _inv_resnet(dst, pre, p):
    _inv_norm(dst, f"{pre}.norm1", p["norm1"])
    _inv_conv(dst, f"{pre}.conv1", p["conv1"])
    if "time_emb_proj" in p:
        _inv_linear(dst, f"{pre}.time_emb_proj", p["time_emb_proj"])
    _inv_norm(dst, f"{pre}.norm2", p["norm2"])
    _inv_conv(dst, f"{pre}.conv2", p["conv2"])
    if "conv_shortcut" in p:
        _inv_conv(dst, f"{pre}.conv_shortcut", p["conv_shortcut"])


def _inv_attn(dst, pre, p, bias=False):
    _inv_linear(dst, f"{pre}.to_q", p["to_q"])
    _inv_linear(dst, f"{pre}.to_k", p["to_k"])
    _inv_linear(dst, f"{pre}.to_v", p["to_v"])
    _inv_linear(dst, f"{pre}.to_out.0", p["to_out"])


def _inv_transformer(dst, pre, p, use_linear):
    _inv_norm(dst, f"{pre}.norm", p["norm"])
    if use_linear:
        _inv_linear(dst, f"{pre}.proj_in", p["proj_in"])
        _inv_linear(dst, f"{pre}.proj_out", p["proj_out"])
    else:
        _inv_conv(dst, f"{pre}.proj_in", p["proj_in"])
        _inv_conv(dst, f"{pre}.proj_out", p["proj_out"])
    for tb, bp in enumerate(p["blocks"]):
        b = f"{pre}.transformer_blocks.{tb}"
        _inv_norm(dst, f"{b}.norm1", bp["norm1"])
        _inv_attn(dst, f"{b}.attn1", bp["attn1"])
        _inv_norm(dst, f"{b}.norm2", bp["norm2"])
        _inv_attn(dst, f"{b}.attn2", bp["attn2"])
        _inv_norm(dst, f"{b}.norm3", bp["norm3"])
        _inv_linear(dst, f"{b}.ff.net.0.proj", bp["ff"]["proj_in"])
        _inv_linear(dst, f"{b}.ff.net.2", bp["ff"]["proj_out"])


def _unet_state_dict(params, cfg):
    dst = {}
    _inv_conv(dst, "conv_in", params["conv_in"])
    _inv_linear(dst, "time_embedding.linear_1",
                params["time_embedding"]["linear_1"])
    _inv_linear(dst, "time_embedding.linear_2",
                params["time_embedding"]["linear_2"])
    for i, block in enumerate(params["down_blocks"]):
        pre = f"down_blocks.{i}"
        for j, r in enumerate(block["resnets"]):
            _inv_resnet(dst, f"{pre}.resnets.{j}", r)
        for j, a in enumerate(block["attentions"]):
            _inv_transformer(dst, f"{pre}.attentions.{j}", a,
                             cfg.use_linear_projection)
        if "downsample" in block:
            _inv_conv(dst, f"{pre}.downsamplers.0.conv", block["downsample"])
    _inv_resnet(dst, "mid_block.resnets.0", params["mid_block"]["resnet1"])
    _inv_transformer(dst, "mid_block.attentions.0",
                     params["mid_block"]["attention"],
                     cfg.use_linear_projection)
    _inv_resnet(dst, "mid_block.resnets.1", params["mid_block"]["resnet2"])
    for i, block in enumerate(params["up_blocks"]):
        pre = f"up_blocks.{i}"
        for j, r in enumerate(block["resnets"]):
            _inv_resnet(dst, f"{pre}.resnets.{j}", r)
        for j, a in enumerate(block["attentions"]):
            _inv_transformer(dst, f"{pre}.attentions.{j}", a,
                             cfg.use_linear_projection)
        if "upsample" in block:
            _inv_conv(dst, f"{pre}.upsamplers.0.conv", block["upsample"])
    _inv_norm(dst, "conv_norm_out", params["conv_norm_out"])
    _inv_conv(dst, "conv_out", params["conv_out"])
    return dst


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32),
            atol=1e-6,
        )


def test_unet_conversion_roundtrip():
    params = unet_init(jax.random.PRNGKey(0), TINY.unet, jnp.float32)
    sd = hf.StateDict(_unet_state_dict(params, TINY.unet))
    got = hf.convert_unet(sd, TINY.unet, jnp.float32)
    _trees_equal(params, got)
    assert sd.unused() == []


def test_vae_conversion_roundtrip():
    params = vae_init(jax.random.PRNGKey(0), TINY.vae, jnp.float32)
    dst = {}
    enc, dec = params["encoder"], params["decoder"]
    _inv_conv(dst, "encoder.conv_in", enc["conv_in"])
    for i, block in enumerate(enc["down_blocks"]):
        for j, r in enumerate(block["resnets"]):
            _inv_resnet(dst, f"encoder.down_blocks.{i}.resnets.{j}", r)
        if "downsample" in block:
            _inv_conv(dst, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                      block["downsample"])
    for k, name in (("resnet1", "resnets.0"), ("resnet2", "resnets.1")):
        _inv_resnet(dst, f"encoder.mid_block.{name}", enc["mid"][k])
    a = enc["mid"]["attention"]
    _inv_norm(dst, "encoder.mid_block.attentions.0.group_norm",
              a["group_norm"])
    _inv_attn(dst, "encoder.mid_block.attentions.0", a)
    _inv_norm(dst, "encoder.conv_norm_out", enc["conv_norm_out"])
    _inv_conv(dst, "encoder.conv_out", enc["conv_out"])
    _inv_conv(dst, "quant_conv", enc["quant_conv"])
    _inv_conv(dst, "post_quant_conv", dec["post_quant_conv"])
    _inv_conv(dst, "decoder.conv_in", dec["conv_in"])
    for k, name in (("resnet1", "resnets.0"), ("resnet2", "resnets.1")):
        _inv_resnet(dst, f"decoder.mid_block.{name}", dec["mid"][k])
    a = dec["mid"]["attention"]
    _inv_norm(dst, "decoder.mid_block.attentions.0.group_norm",
              a["group_norm"])
    _inv_attn(dst, "decoder.mid_block.attentions.0", a)
    for i, block in enumerate(dec["up_blocks"]):
        for j, r in enumerate(block["resnets"]):
            _inv_resnet(dst, f"decoder.up_blocks.{i}.resnets.{j}", r)
        if "upsample" in block:
            _inv_conv(dst, f"decoder.up_blocks.{i}.upsamplers.0.conv",
                      block["upsample"])
    _inv_norm(dst, "decoder.conv_norm_out", dec["conv_norm_out"])
    _inv_conv(dst, "decoder.conv_out", dec["conv_out"])

    got = hf.convert_vae(hf.StateDict(dst), TINY.vae, jnp.float32)
    _trees_equal(params, got)


def test_clip_conversion_roundtrip():
    cfg = TINY.clip
    params = clip_init(jax.random.PRNGKey(0), cfg, jnp.float32)
    dst = {
        "text_model.embeddings.token_embedding.weight": np.asarray(
            params["token_embedding"], np.float32
        ),
        "text_model.embeddings.position_embedding.weight": np.asarray(
            params["position_embedding"], np.float32
        ),
    }
    _inv_norm(dst, "text_model.final_layer_norm",
              params["final_layer_norm"])
    for i, layer in enumerate(params["layers"]):
        lp = f"text_model.encoder.layers.{i}"
        _inv_norm(dst, f"{lp}.layer_norm1", layer["layer_norm1"])
        _inv_linear(dst, f"{lp}.self_attn.q_proj", layer["q_proj"])
        _inv_linear(dst, f"{lp}.self_attn.k_proj", layer["k_proj"])
        _inv_linear(dst, f"{lp}.self_attn.v_proj", layer["v_proj"])
        _inv_linear(dst, f"{lp}.self_attn.out_proj", layer["out_proj"])
        _inv_norm(dst, f"{lp}.layer_norm2", layer["layer_norm2"])
        _inv_linear(dst, f"{lp}.mlp.fc1", layer["fc1"])
        _inv_linear(dst, f"{lp}.mlp.fc2", layer["fc2"])

    got = hf.convert_clip(hf.StateDict(dst), cfg, jnp.float32)
    _trees_equal(params, got)


def test_clip_conversion_extra_tokens():
    cfg = TINY.clip
    params = clip_init(jax.random.PRNGKey(0), cfg, jnp.float32)
    dst = {
        "text_model.embeddings.token_embedding.weight": np.asarray(
            params["token_embedding"], np.float32
        ),
        "text_model.embeddings.position_embedding.weight": np.asarray(
            params["position_embedding"], np.float32
        ),
    }
    _inv_norm(dst, "text_model.final_layer_norm",
              params["final_layer_norm"])
    for i, layer in enumerate(params["layers"]):
        lp = f"text_model.encoder.layers.{i}"
        _inv_norm(dst, f"{lp}.layer_norm1", layer["layer_norm1"])
        _inv_linear(dst, f"{lp}.self_attn.q_proj", layer["q_proj"])
        _inv_linear(dst, f"{lp}.self_attn.k_proj", layer["k_proj"])
        _inv_linear(dst, f"{lp}.self_attn.v_proj", layer["v_proj"])
        _inv_linear(dst, f"{lp}.self_attn.out_proj", layer["out_proj"])
        _inv_norm(dst, f"{lp}.layer_norm2", layer["layer_norm2"])
        _inv_linear(dst, f"{lp}.mlp.fc1", layer["fc1"])
        _inv_linear(dst, f"{lp}.mlp.fc2", layer["fc2"])
    got = hf.convert_clip(hf.StateDict(dst), cfg, jnp.float32,
                          n_extra_tokens=8)
    assert got["token_embedding"].shape[0] == cfg.vocab_size + 8


def test_orbax_param_cache(tmp_path):
    from diffusionspatialcontrol_tpu.convert import cache as pcache
    from diffusionspatialcontrol_tpu.models.clip import clip_init

    params = {"clip": clip_init(jax.random.PRNGKey(0), TINY.clip,
                                jnp.float32)}
    path = str(tmp_path / "snap")
    pcache.save_params(path, params)
    restored = pcache.load_params(path, like=params)
    la = jax.tree_util.tree_leaves(params)
    lb = jax.tree_util.tree_leaves(restored)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_pipeline_params_from_disk(tmp_path):
    """End-to-end checkpoint-directory load: write a synthetic diffusers
    layout (safetensors) and load through convert.hf.load_pipeline_params /
    ModelManager."""
    from safetensors.numpy import save_file

    from diffusionspatialcontrol_tpu.models.vae import vae_init

    unet_params = unet_init(jax.random.PRNGKey(0), TINY.unet, jnp.float32)
    sd_unet = _unet_state_dict(unet_params, TINY.unet)

    # vae state dict via existing inverse helpers
    vae_params = vae_init(jax.random.PRNGKey(1), TINY.vae, jnp.float32)
    dst_vae = {}
    enc, dec = vae_params["encoder"], vae_params["decoder"]
    _inv_conv(dst_vae, "encoder.conv_in", enc["conv_in"])
    for i, block in enumerate(enc["down_blocks"]):
        for j, r in enumerate(block["resnets"]):
            _inv_resnet(dst_vae, f"encoder.down_blocks.{i}.resnets.{j}", r)
        if "downsample" in block:
            _inv_conv(dst_vae,
                      f"encoder.down_blocks.{i}.downsamplers.0.conv",
                      block["downsample"])
    for k, name in (("resnet1", "resnets.0"), ("resnet2", "resnets.1")):
        _inv_resnet(dst_vae, f"encoder.mid_block.{name}", enc["mid"][k])
    a = enc["mid"]["attention"]
    _inv_norm(dst_vae, "encoder.mid_block.attentions.0.group_norm",
              a["group_norm"])
    _inv_attn(dst_vae, "encoder.mid_block.attentions.0", a)
    _inv_norm(dst_vae, "encoder.conv_norm_out", enc["conv_norm_out"])
    _inv_conv(dst_vae, "encoder.conv_out", enc["conv_out"])
    _inv_conv(dst_vae, "quant_conv", enc["quant_conv"])
    _inv_conv(dst_vae, "post_quant_conv", dec["post_quant_conv"])
    _inv_conv(dst_vae, "decoder.conv_in", dec["conv_in"])
    for k, name in (("resnet1", "resnets.0"), ("resnet2", "resnets.1")):
        _inv_resnet(dst_vae, f"decoder.mid_block.{name}", dec["mid"][k])
    a = dec["mid"]["attention"]
    _inv_norm(dst_vae, "decoder.mid_block.attentions.0.group_norm",
              a["group_norm"])
    _inv_attn(dst_vae, "decoder.mid_block.attentions.0", a)
    for i, block in enumerate(dec["up_blocks"]):
        for j, r in enumerate(block["resnets"]):
            _inv_resnet(dst_vae, f"decoder.up_blocks.{i}.resnets.{j}", r)
        if "upsample" in block:
            _inv_conv(dst_vae, f"decoder.up_blocks.{i}.upsamplers.0.conv",
                      block["upsample"])
    _inv_norm(dst_vae, "decoder.conv_norm_out", dec["conv_norm_out"])
    _inv_conv(dst_vae, "decoder.conv_out", dec["conv_out"])

    clip_params = clip_init(jax.random.PRNGKey(2), TINY.clip, jnp.float32)
    dst_clip = {
        "text_model.embeddings.token_embedding.weight": np.asarray(
            clip_params["token_embedding"], np.float32
        ),
        "text_model.embeddings.position_embedding.weight": np.asarray(
            clip_params["position_embedding"], np.float32
        ),
    }
    _inv_norm(dst_clip, "text_model.final_layer_norm",
              clip_params["final_layer_norm"])
    for i, layer in enumerate(clip_params["layers"]):
        lp = f"text_model.encoder.layers.{i}"
        _inv_norm(dst_clip, f"{lp}.layer_norm1", layer["layer_norm1"])
        _inv_linear(dst_clip, f"{lp}.self_attn.q_proj", layer["q_proj"])
        _inv_linear(dst_clip, f"{lp}.self_attn.k_proj", layer["k_proj"])
        _inv_linear(dst_clip, f"{lp}.self_attn.v_proj", layer["v_proj"])
        _inv_linear(dst_clip, f"{lp}.self_attn.out_proj",
                    layer["out_proj"])
        _inv_norm(dst_clip, f"{lp}.layer_norm2", layer["layer_norm2"])
        _inv_linear(dst_clip, f"{lp}.mlp.fc1", layer["fc1"])
        _inv_linear(dst_clip, f"{lp}.mlp.fc2", layer["fc2"])

    root = tmp_path / "ckpt"
    for sub, dstd in (("unet", sd_unet), ("vae", dst_vae),
                      ("text_encoder", dst_clip)):
        (root / sub).mkdir(parents=True)
        fname = ("model.safetensors" if sub == "text_encoder"
                 else "diffusion_pytorch_model.safetensors")
        save_file({k: np.ascontiguousarray(v) for k, v in dstd.items()},
                  str(root / sub / fname))

    from diffusionspatialcontrol_tpu.app.api import ModelManager

    m = ModelManager(dtype=jnp.float32)
    m.register("disk-tiny", str(root), TINY)
    cfg, params, tok = m.get("disk-tiny")
    _trees_equal(params["unet"], unet_params)
    _trees_equal(params["vae"], vae_params)
    # clip has 64 extra-token pad rows
    assert (
        params["clip"]["token_embedding"].shape[0]
        == TINY.clip.vocab_size + 64
    )
    # and it generates
    from diffusionspatialcontrol_tpu.app.api import inference

    out = inference(m, prompt="a cat", model="disk-tiny", sampler="Euler",
                    steps=2, width=64, height=64, encoding_mode="short",
                    dtype=jnp.float32)
    assert out["images"].shape == (1, 64, 64, 3)


def test_asymmetric_vae_conversion_and_decode():
    """Asymmetric (mask-conditioned) VAE: condition-encoder weights convert
    from the diffusers key layout and the conditioned decode blends
    known-pixel features (decode differs with vs without condition)."""
    import dataclasses as _dc

    from diffusionspatialcontrol_tpu.models.vae import vae_decode

    cfg = _dc.replace(TINY.vae, asymmetric=True,
                      decoder_layers_per_block=TINY.vae.layers_per_block)
    params = vae_init(jax.random.PRNGKey(1), cfg, jnp.float32)
    assert "condition_encoder" in params["decoder"]

    dst = {}
    for i, layer in enumerate(params["decoder"]["condition_encoder"]
                              ["layers"]):
        _inv_conv(dst, f"decoder.condition_encoder.layers.{i}", layer)
    sd = hf.StateDict(dst)
    got = hf.convert_vae.__wrapped__ if hasattr(hf.convert_vae,
                                                "__wrapped__") else None
    # convert only the condition-encoder piece by probing the full convert
    # path would need a complete VAE sd; check the layer loader directly:
    layers = []
    i = 0
    while f"decoder.condition_encoder.layers.{i}.weight" in sd.tensors:
        layers.append(hf._conv(sd, f"decoder.condition_encoder.layers.{i}",
                               jnp.float32))
        i += 1
    assert len(layers) == len(params["decoder"]["condition_encoder"]
                              ["layers"])
    for a, b in zip(layers,
                    params["decoder"]["condition_encoder"]["layers"]):
        np.testing.assert_array_equal(np.asarray(a["kernel"]),
                                      np.asarray(b["kernel"]))

    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    img = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3)) * 2 - 1
    mask = jnp.zeros((1, 64, 64, 1)).at[:, :32].set(1.0)
    plain = vae_decode(params, cfg, lat)
    cond = vae_decode(params, cfg, lat, cond_image=img * (1 - mask),
                      cond_mask=mask)
    assert plain.shape == cond.shape == (1, 64, 64, 3)
    assert not np.allclose(np.asarray(plain), np.asarray(cond))
    with pytest.raises(ValueError):
        vae_decode(
            vae_init(jax.random.PRNGKey(1), TINY.vae, jnp.float32),
            TINY.vae, lat, cond_image=img, cond_mask=mask,
        )
