"""Diffusers-free Wan forward golden: minimal torch re-implementation.

VERDICT item 10: WanDiT numerical parity vs pretrained weights cannot be
checked in this environment (zero egress, no diffusers, no weights), so this
test re-implements the diffusers ``WanTransformer3DModel`` forward semantics
(the backbone the reference drives via src/models/wan_backbone.py:21 and
src/models/wan_sla.py) as a minimal standalone torch module at tiny scale,
exports its randomly-initialized weights in the diffusers state-dict naming,
converts them through ``convert_wan_state_dict`` (the same converter used for
real safetensors checkpoints), and checks the flax ``WanDiT`` forward against
the torch forward end to end — patch embed, time/text embedding (incl. the
[cos|sin]→[sin|cos] row flip), 3D rotary (interleaved pairs, reference
src/models/wan_sla.py:15-22 semantics), adaLN block modulation, qk RMSNorm,
head modulation by t_emb, and unpatchify.

Any silent semantic mismatch in the flax block or the converter name/layout
map shows up here as a forward divergence; full-model parity against the real
Wan2.1 weights remains tracked (docs/PARITY.md) for when weights exist.
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from interpolated_diffusion_tpu.models.wan_convert import (  # noqa: E402
    convert_wan_state_dict,
    export_wan_state_dict,
)
from interpolated_diffusion_tpu.models.wan_dit import (  # noqa: E402
    WanDiT,
    build_rope_freqs,
    wan_rope_tables,
)

# tiny Wan geometry
DIM, LAYERS, HEADS, FFN = 48, 2, 4, 96
C, T, H, W = 4, 4, 4, 4
TEXT_DIM, TEXT_LEN, FREQ_DIM = 32, 6, 32
PATCH = (1, 2, 2)
EPS = 1e-6


class _RMSNorm(nn.Module):
    """diffusers RMSNorm (across the full inner dim, learnable weight)."""

    def __init__(self, dim):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return x * torch.rsqrt(var + EPS) * self.weight


class _Attn(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        self.norm_q = _RMSNorm(dim)
        self.norm_k = _RMSNorm(dim)

    def forward(self, x, kv=None, rope=None):
        kv = x if kv is None else kv
        B, L, D = x.shape
        Lk = kv.shape[1]
        dh = D // self.heads
        q = self.norm_q(self.to_q(x))
        k = self.norm_k(self.to_k(kv))
        v = self.to_v(kv)
        q = q.view(B, L, self.heads, dh).transpose(1, 2)
        k = k.view(B, Lk, self.heads, dh).transpose(1, 2)
        v = v.view(B, Lk, self.heads, dh).transpose(1, 2)
        if rope is not None:
            cos, sin = rope  # [L, dh/2] each
            q = _rotate(q, cos, sin)
            k = _rotate(k, cos, sin)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(B, L, D)
        return self.to_out[0](o)


def _rotate(x, cos, sin):
    """Interleaved-pair rotation (reference src/models/wan_sla.py:15-22)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    y = torch.empty_like(x)
    y[..., 0::2] = x1 * cos - x2 * sin
    y[..., 1::2] = x1 * sin + x2 * cos
    return y


class _GELUProj(nn.Module):
    def __init__(self, dim, ffn):
        super().__init__()
        self.proj = nn.Linear(dim, ffn)

    def forward(self, x):
        return F.gelu(self.proj(x), approximate="tanh")


class _FFN(nn.Module):
    """diffusers FeedForward: .net = [GELU(proj), Dropout, Linear]."""

    def __init__(self, dim, ffn):
        super().__init__()
        self.net = nn.ModuleList([_GELUProj(dim, ffn), nn.Identity(),
                                  nn.Linear(ffn, dim)])

    def forward(self, x):
        return self.net[2](self.net[0](x))


class _Block(nn.Module):
    def __init__(self, dim, heads, ffn):
        super().__init__()
        self.scale_shift_table = nn.Parameter(torch.randn(1, 6, dim) * 0.2)
        self.attn1 = _Attn(dim, heads)
        self.attn2 = _Attn(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=EPS)
        self.ffn = _FFN(dim, ffn)

    def forward(self, x, ctx, temb6, rope):
        mods = (self.scale_shift_table + temb6.float()).chunk(6, dim=1)
        shift1, scale1, gate1, shift2, scale2, gate2 = mods
        h = F.layer_norm(x, (x.shape[-1],), eps=EPS) * (1 + scale1) + shift1
        x = x + gate1 * self.attn1(h, rope=rope)
        x = x + self.attn2(self.norm2(x), kv=ctx)
        h = F.layer_norm(x, (x.shape[-1],), eps=EPS) * (1 + scale2) + shift2
        return x + gate2 * self.ffn(h)


class _TimeText(nn.Module):
    """condition_embedder: Timesteps(flip_sin_to_cos) → MLP; text MLP."""

    def __init__(self, dim, freq_dim, text_dim):
        super().__init__()
        self.time_embedder = nn.Module()
        self.time_embedder.linear_1 = nn.Linear(freq_dim, dim)
        self.time_embedder.linear_2 = nn.Linear(dim, dim)
        self.time_proj = nn.Linear(dim, 6 * dim)
        self.text_embedder = nn.Module()
        self.text_embedder.linear_1 = nn.Linear(text_dim, dim)
        self.text_embedder.linear_2 = nn.Linear(dim, dim)

    def forward(self, t, text):
        half = FREQ_DIM // 2
        freqs = torch.exp(
            -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
        )
        args = t.float()[:, None] * freqs[None]
        # diffusers Timesteps(flip_sin_to_cos=True): [cos | sin]
        sincos = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        temb = self.time_embedder.linear_2(
            F.silu(self.time_embedder.linear_1(sincos))
        )
        temb6 = self.time_proj(F.silu(temb))
        ctx = self.text_embedder.linear_2(
            F.gelu(self.text_embedder.linear_1(text), approximate="tanh")
        )
        return temb, temb6, ctx


class _TorchWanTiny(nn.Module):
    def __init__(self):
        super().__init__()
        self.patch_embedding = nn.Conv3d(C, DIM, PATCH, stride=PATCH)
        self.condition_embedder = _TimeText(DIM, FREQ_DIM, TEXT_DIM)
        self.blocks = nn.ModuleList(
            [_Block(DIM, HEADS, FFN) for _ in range(LAYERS)]
        )
        self.scale_shift_table = nn.Parameter(torch.randn(1, 2, DIM) * 0.2)
        self.proj_out = nn.Linear(DIM, C * PATCH[0] * PATCH[1] * PATCH[2])

    def forward(self, lat, t, text, rope):
        B = lat.shape[0]
        x = self.patch_embedding(lat)            # [B, dim, ppf, pph, ppw]
        x = x.flatten(2).transpose(1, 2)         # [B, L, dim]
        temb, temb6, ctx = self.condition_embedder(t, text)
        temb6 = temb6.unflatten(1, (6, DIM))
        for blk in self.blocks:
            x = blk(x, ctx, temb6, rope)
        shift, scale = (
            self.scale_shift_table + temb.float().unsqueeze(1)
        ).chunk(2, dim=1)
        x = F.layer_norm(x, (DIM,), eps=EPS) * (1 + scale) + shift
        x = self.proj_out(x)
        # unpatchify [B, L, C*pt*ph*pw] → [B, C, T, H, W]
        pt, ph, pw = PATCH
        ppf, pph, ppw = T // pt, H // ph, W // pw
        x = x.view(B, ppf, pph, ppw, C, pt, ph, pw)
        x = x.permute(0, 4, 1, 5, 2, 6, 3, 7).reshape(B, C, T, H, W)
        return x


def _rope_tables_np():
    head_dim = DIM // HEADS
    pt, ph, pw = PATCH
    tables, dims = wan_rope_tables(64, head_dim)
    cos, sin = build_rope_freqs(tables, dims, T // pt, H // ph, W // pw)
    return np.asarray(cos[0]), np.asarray(sin[0])


def test_wan_forward_matches_torch_reimplementation():
    torch.manual_seed(0)
    tm = _TorchWanTiny().eval()

    B = 2
    lat_t = torch.randn(B, C, T, H, W)
    t_t = torch.tensor([17.0, 403.0])
    text_t = torch.randn(B, TEXT_LEN, TEXT_DIM)
    cos_np, sin_np = _rope_tables_np()
    with torch.no_grad():
        out_t = tm(lat_t, t_t, text_t,
                   (torch.from_numpy(cos_np), torch.from_numpy(sin_np)))

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_wan_state_dict(sd, layer_mode="loop")
    model = WanDiT(
        dim=DIM, n_layers=LAYERS, n_heads=HEADS, ffn_dim=FFN,
        in_channels=C, out_channels=C, text_dim=TEXT_DIM, freq_dim=FREQ_DIM,
        patch_size=PATCH, max_seq_len=64, layer_mode="loop",
        dtype=jnp.float32,
    )
    out_j = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(lat_t.numpy()),
        jnp.asarray(t_t.numpy()),
        jnp.asarray(text_t.numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), atol=2e-4, rtol=2e-3
    )


def test_wan_forward_matches_torch_scan_layout():
    """Same golden through the scan (stacked-block) parameter layout."""
    torch.manual_seed(1)
    tm = _TorchWanTiny().eval()
    B = 1
    lat_t = torch.randn(B, C, T, H, W)
    t_t = torch.tensor([250.0])
    text_t = torch.randn(B, TEXT_LEN, TEXT_DIM)
    cos_np, sin_np = _rope_tables_np()
    with torch.no_grad():
        out_t = tm(lat_t, t_t, text_t,
                   (torch.from_numpy(cos_np), torch.from_numpy(sin_np)))

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_wan_state_dict(sd, layer_mode="scan")
    model = WanDiT(
        dim=DIM, n_layers=LAYERS, n_heads=HEADS, ffn_dim=FFN,
        in_channels=C, out_channels=C, text_dim=TEXT_DIM, freq_dim=FREQ_DIM,
        patch_size=PATCH, max_seq_len=64, layer_mode="scan",
        dtype=jnp.float32,
    )
    out_j = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(lat_t.numpy()),
        jnp.asarray(t_t.numpy()),
        jnp.asarray(text_t.numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), atol=2e-4, rtol=2e-3
    )


def test_converter_round_trip_on_torch_layout():
    """export_wan_state_dict inverts convert_wan_state_dict on a real
    torch-module state dict (not just synthetic arrays)."""
    torch.manual_seed(2)
    tm = _TorchWanTiny()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_wan_state_dict(sd, layer_mode="loop")
    back = export_wan_state_dict(params, patch_size=PATCH, in_channels=C)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


@pytest.mark.slow
def test_wan_lora_grad_step_matches_torch():
    """Train-step golden for the LoRA fine-tuning path (VERDICT round-3
    item 6a): identical LoRA adapters (tree-surgery form, models/lora.py
    apply_lora — W' = W + (α/r)·A·B) attached to the torch re-implementation
    and the flax WanDiT must produce matching LoRA gradients for the same
    MSE loss, and matching forwards after one SGD step. This pins the full
    differentiable path the reference fine-tunes through
    (train_keypoints_wansynth.py:331-344 inject_lora + anchor-slot MSE)."""
    from interpolated_diffusion_tpu.models.lora import apply_lora

    RANK, ALPHA, LR = 2, 16.0, 0.05
    scale = ALPHA / RANK
    torch.manual_seed(3)
    tm = _TorchWanTiny()

    # identical seeded adapters on every attention projection, both sides
    rng = np.random.RandomState(7)
    lora_np, torch_ps = {}, []
    for i, blk in enumerate(tm.blocks):
        for attn_name, attn in (("self_attn", blk.attn1),
                                ("cross_attn", blk.attn2)):
            for pn, lin in (("q_proj", attn.to_q), ("k_proj", attn.to_k),
                            ("v_proj", attn.to_v), ("o_proj", attn.to_out[0])):
                d_in, d_out = lin.in_features, lin.out_features
                A = (rng.randn(d_in, RANK) * 0.1).astype(np.float32)
                Bm = (rng.randn(RANK, d_out) * 0.1).astype(np.float32)
                name = f"block_{i}/{attn_name}/{pn}"
                lora_np[name] = {"A": A, "B": Bm}
                At = nn.Parameter(torch.from_numpy(A.copy()))
                Bt = nn.Parameter(torch.from_numpy(Bm.copy()))
                torch_ps.append((name, At, Bt))
                lin.forward = (
                    lambda x, _f=type(lin).forward, _l=lin, _A=At, _B=Bt:
                    _f(_l, x) + (x @ _A @ _B) * scale)

    B = 2
    lat = np.random.RandomState(11).randn(B, C, T, H, W).astype(np.float32)
    tt = np.asarray([31.0, 640.0], np.float32)
    text = np.random.RandomState(12).randn(B, TEXT_LEN, TEXT_DIM).astype(np.float32)
    target = np.random.RandomState(13).randn(B, C, T, H, W).astype(np.float32)
    cos_np, sin_np = _rope_tables_np()

    # torch: loss -> LoRA grads -> one SGD step
    out_t = tm(torch.from_numpy(lat), torch.from_numpy(tt),
               torch.from_numpy(text),
               (torch.from_numpy(cos_np), torch.from_numpy(sin_np)))
    loss_t = ((out_t - torch.from_numpy(target)) ** 2).mean()
    loss_t.backward()
    grads_t = {name: (A.grad.numpy().copy(), Bt.grad.numpy().copy())
               for name, A, Bt in torch_ps}
    with torch.no_grad():
        for _, A, Bt in torch_ps:
            A -= LR * A.grad
            Bt -= LR * Bt.grad
    out_t2 = tm(torch.from_numpy(lat), torch.from_numpy(tt),
                torch.from_numpy(text),
                (torch.from_numpy(cos_np), torch.from_numpy(sin_np)))

    # flax: same base weights through the converter, same adapters
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    base = jax.tree_util.tree_map(
        jnp.asarray, convert_wan_state_dict(sd, layer_mode="loop"))
    model = WanDiT(
        dim=DIM, n_layers=LAYERS, n_heads=HEADS, ffn_dim=FFN,
        in_channels=C, out_channels=C, text_dim=TEXT_DIM, freq_dim=FREQ_DIM,
        patch_size=PATCH, max_seq_len=64, layer_mode="loop",
        dtype=jnp.float32,
    )
    lora0 = jax.tree_util.tree_map(jnp.asarray, lora_np)

    def loss_fn(lora):
        merged = apply_lora(base, lora, RANK, ALPHA)
        out = model.apply({"params": merged}, jnp.asarray(lat),
                          jnp.asarray(tt), jnp.asarray(text))
        return jnp.mean((out - jnp.asarray(target)) ** 2)

    grads_j = jax.grad(loss_fn)(lora0)
    for name, (gA_t, gB_t) in grads_t.items():
        np.testing.assert_allclose(
            np.asarray(grads_j[name]["A"]), gA_t, atol=2e-5, rtol=2e-3,
            err_msg=f"{name}/A")
        np.testing.assert_allclose(
            np.asarray(grads_j[name]["B"]), gB_t, atol=2e-5, rtol=2e-3,
            err_msg=f"{name}/B")

    lora1 = jax.tree_util.tree_map(lambda p, g: p - LR * g, lora0, grads_j)
    out_j2 = model.apply({"params": apply_lora(base, lora1, RANK, ALPHA)},
                         jnp.asarray(lat), jnp.asarray(tt), jnp.asarray(text))
    np.testing.assert_allclose(np.asarray(out_j2), out_t2.detach().numpy(),
                               atol=5e-4, rtol=5e-3)
