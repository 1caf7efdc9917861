"""Cross-framework checkpoint conversion: original PyTorch HP-VAE-GAN
checkpoints -> this framework's (params, state) pytrees.

Equivalent of the reference's src/tools/pt2ms.py key remappers (which map the
same torch checkpoints into MindSpore Cell names, pt2ms.py:8-197), including
the pieces the reference left broken (stub m2m_HPVAEGAN_3d :191-192, missing
m2m_WDiscriminator_3d).

Torch layouts handled (the original SakiRinn/hp-vae-gan naming, visible in
pt2ms.py's regexes):
  netG: encode.features.conv_block_<i>.conv.{weight_orig,bias,weight_u,weight_v}
        encode.{mu,logvar}.conv.{weight,bias}
        {decoder,body.<k>}.{head,block<i>,tail}.{conv,norm}.*
  netD: {head,body.block<i>}.conv.{weight_orig,...}, tail.{weight,bias}
Weight transposes: torch OIHW -> HWIO (2D), OIDHW -> DHWIO (3D). Spectral-norm
v vectors are re-permuted from torch's (I,KH,KW) flattening to ours
((KH,KW,I)); one power-iteration step re-tightens them regardless.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _np(value):
    if hasattr(value, "detach"):
        value = value.detach().cpu().numpy()
    return np.asarray(value, np.float32)


def _conv_w(value, ndim: int):
    w = _np(value)
    if ndim == 2:
        return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 4, 1, 0))  # OIDHW -> DHWIO


def _sn_v_perm(v, w_oihw, ndim: int):
    """Permute torch's v over (I, *K) C-order flatten to ours over (*K, I)."""
    v = _np(v).reshape(-1)
    shape = w_oihw.shape  # (O, I, *K)
    if ndim == 2:
        o, i, kh, kw = shape
        idx = np.arange(i * kh * kw).reshape(i, kh, kw)
        perm = np.transpose(idx, (1, 2, 0)).reshape(-1)  # (kh,kw,i) order
    else:
        o, i, kd, kh, kw = shape
        idx = np.arange(i * kd * kh * kw).reshape(i, kd, kh, kw)
        perm = np.transpose(idx, (1, 2, 3, 0)).reshape(-1)
    # perm[r] = torch column index for our row r; gather directly
    return v[perm]


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _stack_to_conv_stack(keys_values, ndim: int) -> Tuple[Dict, Dict]:
    """Convert a torch head/block<i>/tail stack (the decoder or one body
    stage) to our conv_stack {blocks: [...], tail: {...}} params/state."""
    blocks_p: Dict[int, Dict] = {}
    blocks_s: Dict[int, Dict] = {}
    tail = {}
    for key, value in keys_values:
        if key.startswith("head."):
            idx, rest = 0, key[len("head."):]
        elif key.startswith("tail."):
            # plain conv tail: tail.weight / tail.bias
            name = key[len("tail."):]
            if name == "weight":
                tail["w"] = _conv_w(value, ndim)
            elif name == "bias":
                tail["b"] = _np(value)
            continue
        else:
            m = re.match(r"block(\d+)\.(.*)", key)
            if not m:
                continue
            idx, rest = int(m.group(1)) + 1, m.group(2)
        bp = blocks_p.setdefault(idx, {})
        bs = blocks_s.setdefault(idx, {})
        if rest == "conv.weight":
            bp.setdefault("conv", {})["w"] = _conv_w(value, ndim)
        elif rest == "conv.bias":
            bp.setdefault("conv", {})["b"] = _np(value)
        elif rest == "norm.weight":
            bp.setdefault("bn", {})["gamma"] = _np(value)
        elif rest == "norm.bias":
            bp.setdefault("bn", {})["beta"] = _np(value)
        elif rest == "norm.running_mean":
            bs.setdefault("bn", {})["mean"] = _np(value)
        elif rest == "norm.running_var":
            bs.setdefault("bn", {})["var"] = _np(value)
    n = max(blocks_p) + 1 if blocks_p else 0
    return ({"blocks": [blocks_p[i] for i in range(n)], "tail": tail},
            {"blocks": [blocks_s.get(i, {}) for i in range(n)]})


def _sn_conv(entries, ndim: int) -> Tuple[Dict, Dict]:
    """torch SN conv entries {weight_orig, bias, weight_u, weight_v} ->
    ({snconv: {w, b}}, {sn: {u, v}})."""
    params, state = {"snconv": {}}, {"sn": {}}
    w_oihw = None
    for name, value in entries.items():
        if name == "weight_orig" or name == "weight":
            w_oihw = _np(value)
            params["snconv"]["w"] = _conv_w(value, ndim)
        elif name == "bias":
            params["snconv"]["b"] = _np(value)
        elif name == "weight_u":
            state["sn"]["u"] = _np(value).reshape(-1)
    if "weight_v" in entries and w_oihw is not None:
        state["sn"]["v"] = _sn_v_perm(entries["weight_v"], w_oihw, ndim)
    # checkpoints saved without the SN hook vectors: synthesize normalized
    # ones (one power-iteration step re-converges them)
    if w_oihw is not None:
        rng = np.random.RandomState(0)
        if "u" not in state["sn"]:
            u = rng.standard_normal(w_oihw.shape[0]).astype(np.float32)
            state["sn"]["u"] = u / max(np.linalg.norm(u), 1e-12)
        if "v" not in state["sn"]:
            v = rng.standard_normal(int(np.prod(w_oihw.shape[1:]))
                                    ).astype(np.float32)
            state["sn"]["v"] = v / max(np.linalg.norm(v), 1e-12)
    return params, state


def _collect_sn_stack(items, ndim: int):
    """List of (block_idx, param_name, value) -> ([params], [states])."""
    by_idx: Dict[int, Dict] = {}
    for idx, name, value in items:
        by_idx.setdefault(idx, {})[name] = value
    n = max(by_idx) + 1 if by_idx else 0
    params, states = [], []
    for i in range(n):
        p, s = _sn_conv(by_idx[i], ndim)
        params.append(p), states.append(s)
    return params, states


def p2j_HPVAEGAN(netG_pth, ndim: int = 2) -> Tuple[Dict, Dict]:
    """Torch GeneratorHPVAEGAN state_dict -> (params, state)
    (reference: p2m_HPVAEGAN_2d/3d, pt2ms.py:30-89,129-188)."""
    sd = netG_pth["state_dict"] if "state_dict" in netG_pth else netG_pth
    params: Dict = {"encode": {}, "decoder": {}, "body": []}
    state: Dict = {"encode": {}, "decoder": {}, "body": []}

    feat_items = []
    enc_heads: Dict[str, Dict] = {"mu": {}, "logvar": {}, "bern": {}}
    dec_items = []
    body_items: Dict[int, list] = {}

    for key, value in sd.items():
        if "num_batches_tracked" in key:
            continue
        if key.startswith("encode."):
            rest = key[len("encode."):]
            m = re.match(r"features\.conv_block_(\d+)\.conv\.(.*)", rest)
            if m:
                feat_items.append((int(m.group(1)), m.group(2), value))
                continue
            m = re.match(r"(mu|logvar|bern)\.conv\.(.*)", rest)
            if m:
                enc_heads[m.group(1)][m.group(2)] = value
                continue
        elif key.startswith("decoder."):
            dec_items.append((key[len("decoder."):], value))
        elif key.startswith("body."):
            m = re.match(r"body\.(\d+)\.(.*)", key)
            if m:
                body_items.setdefault(int(m.group(1)), []).append(
                    (m.group(2), value))

    fp, fs = _collect_sn_stack(feat_items, ndim)
    params["encode"]["features"] = fp
    state["encode"]["features"] = fs
    for name in ("mu", "logvar", "bern"):
        if enc_heads[name]:
            params["encode"][name] = {
                "w": _conv_w(enc_heads[name]["weight"], ndim),
                "b": _np(enc_heads[name]["bias"]),
            }

    params["decoder"], state["decoder"] = _stack_to_conv_stack(dec_items, ndim)
    for k in sorted(body_items):
        sp, ss = _stack_to_conv_stack(body_items[k], ndim)
        params["body"].append(sp)
        state["body"].append(ss)
    return params, state


def p2j_WDiscriminator(netD_pth, ndim: int = 2) -> Tuple[Dict, Dict]:
    """Torch WDiscriminator state_dict -> (params, state)
    (reference: p2m_WDiscriminator_2d/3d, pt2ms.py:8-27,107-126)."""
    sd = netD_pth["state_dict"] if "state_dict" in netD_pth else netD_pth
    head_entries: Dict = {}
    body_items = []
    tail: Dict = {}
    for key, value in sd.items():
        if key.startswith("head.conv."):
            head_entries[key[len("head.conv."):]] = value
        elif key.startswith("body."):
            m = re.match(r"body\.block(\d+)\.conv\.(.*)", key)
            if m:
                body_items.append((int(m.group(1)), m.group(2), value))
        elif key.startswith("tail."):
            name = key[len("tail."):]
            if name == "weight":
                tail["w"] = _conv_w(value, ndim)
            elif name == "bias":
                tail["b"] = _np(value)
    hp, hs = _sn_conv(head_entries, ndim)
    bp, bs = _collect_sn_stack(body_items, ndim)
    return ({"head": hp, "body": bp, "tail": tail},
            {"head": hs, "body": bs})


_MS_BN_NAMES = {"gamma": "weight", "beta": "bias",
                "moving_mean": "running_mean",
                "moving_variance": "running_var"}


def _ms_stack_key(segs) -> str:
    """MindSpore conv-stack segments -> torch name within a stage/decoder.

    p2m (pt2ms.py:62-82) renames: head.->0., block<i>.-><i+1>., tail.->
    <num_layer+1>., conv.->0., norm.->1. (+ BN gamma/beta/moving_* names).
    The plain tail conv has no module level, so '<n>.weight|bias' is the
    tail regardless of what <n> is (num_layer varies per config). 3D BN
    names carry an extra level (norm. -> 1.bn2d., pt2ms.py:175)."""
    if len(segs) == 2 and segs[1] in ("weight", "bias"):
        return f"tail.{segs[1]}"
    if len(segs) == 4 and segs[1] == "1" and segs[2] == "bn2d":
        segs = [segs[0], "1", segs[3]]
    if len(segs) == 3 and segs[1] in ("0", "1") and segs[0].isdigit():
        n = int(segs[0])
        blk = "head" if n == 0 else f"block{n - 1}"
        mod = "conv" if segs[1] == "0" else "norm"
        return f"{blk}.{mod}.{_MS_BN_NAMES.get(segs[2], segs[2])}"
    return ""


def _m2t_generator(ms: Dict) -> Dict:
    """MindSpore GeneratorHPVAEGAN parameter names -> the original torch
    naming (the exact inverse of p2m_HPVAEGAN_2d/3d, pt2ms.py:30-89,129-188,
    composed with the reference's own m2m body renumbering, pt2ms.py:92-104,
    for checkpoints saved straight from a MindSpore cell whose body keys
    lack the 'body.' prefix)."""
    out: Dict = {}
    for key, value in ms.items():
        k = key
        if not k.startswith(("encode.", "decoder.", "body.")):
            # reference m2m renumbering, applied verbatim
            m = re.match(r"^(\d+)\.", k)
            if not m:
                continue
            num = int(m.group(1))
            if num != 0:
                k = k.replace(f"{num}.", f"0.0.{num}.", 1)
            k = "body." + k
        if k.startswith("encode."):
            rest = k[len("encode."):]
            m = re.match(r"_features\.(\d+)\.0\.(.*)", rest)
            if m:
                out[f"encode.features.conv_block_{m.group(1)}"
                    f".conv.{m.group(2)}"] = value
                continue
            m = re.match(r"_(mu|logvar|bern)\.0\.(.*)", rest)
            if m:
                out[f"encode.{m.group(1)}.conv.{m.group(2)}"] = value
            continue
        if k.startswith("decoder."):
            name = _ms_stack_key(k[len("decoder."):].split("."))
            if name:
                out["decoder." + name] = value
            continue
        segs = k[len("body."):].split(".")
        # stage addressing (p2m): stage 0 keys are 'body.0.<n>...', stage
        # k>=1 keys are 'body.0.0.<k>.<n>...'. Prefer the stage-k reading
        # when it yields a valid stack key, else fall back to stage 0 —
        # length alone cannot disambiguate the 3D bn2d names (a stage-0
        # head-BN key 'body.0.0.1.bn2d.gamma' is 5 segments too).
        if segs[0] != "0":
            continue
        name, stage = "", 0
        if len(segs) >= 5 and segs[1] == "0" and segs[2].isdigit():
            name = _ms_stack_key(segs[3:])
            stage = int(segs[2])
        if not name:
            name, stage = _ms_stack_key(segs[1:]), 0
        if name:
            out[f"body.{stage}." + name] = value
    return out


def _m2t_discriminator(ms: Dict) -> Dict:
    """MindSpore WDiscriminator names -> torch naming (inverse of
    p2m_WDiscriminator_2d/3d, pt2ms.py:8-27,107-126: head.conv.->head.0.,
    body.block<i!=0>.conv.->body.0.<i>.0., body.block0.conv.->body.0.0.,
    weight_orig->weight; the linear tail keeps its names)."""
    out: Dict = {}
    for k, value in ms.items():
        if k.startswith("head.0."):
            out["head.conv." + k[len("head.0."):]] = value
        elif k.startswith("tail."):
            out[k] = value
        elif k.startswith("body."):
            segs = k[len("body."):].split(".")
            if len(segs) == 3 and segs[0] == "0" and segs[1] == "0":
                blk, name = 0, segs[2]
            elif len(segs) == 4 and segs[0] == "0" and segs[2] == "0":
                blk, name = int(segs[1]), segs[3]
            else:
                continue
            out[f"body.block{blk}.conv.{name}"] = value
    return out


def _check_mapped(ms: Dict, mapped: Dict, kind: str) -> None:
    """The name mappers silently skip unrecognized keys; a checkpoint that
    maps to (almost) nothing is the WRONG checkpoint (e.g. a netD file fed
    to the generator loader) and must fail here, not as a cryptic pytree
    shape error downstream."""
    if len(mapped) < max(1, len(ms) // 2):
        sample = ", ".join(sorted(ms)[:5])
        raise ValueError(
            f"only {len(mapped)}/{len(ms)} checkpoint entries map to "
            f"{kind} parameter names — wrong checkpoint type? "
            f"(sample keys: {sample})")


def m2j_HPVAEGAN(ms_ckpt: Dict, ndim: int = 2) -> Tuple[Dict, Dict]:
    """MindSpore checkpoint dict ({name: array}, e.g. from
    tools.ms_ckpt.load_ms_checkpoint) -> (params, state). Covers the
    reference's .ckpt eval-resume path (eval_image.py:163-165), which it
    implements as mindspore.load_checkpoint + m2m_HPVAEGAN_2d; here the MS
    names are mapped back to the original torch naming and the torch
    converter pipeline is reused (transposes, SN v re-permutation)."""
    t = _m2t_generator(ms_ckpt)
    _check_mapped(ms_ckpt, t, "generator")
    return p2j_HPVAEGAN(t, ndim=ndim)


def m2j_WDiscriminator(ms_ckpt: Dict, ndim: int = 2) -> Tuple[Dict, Dict]:
    """MindSpore WDiscriminator checkpoint dict -> (params, state) —
    including the 3D case the reference references but never implemented
    (train_video.py:57,61 calls a missing m2m_WDiscriminator_3d)."""
    t = _m2t_discriminator(ms_ckpt)
    _check_mapped(ms_ckpt, t, "discriminator")
    return p2j_WDiscriminator(t, ndim=ndim)


def _conv_w_inv(w, ndim: int):
    """Our HWIO/DHWIO conv weight back to torch OIHW/OIDHW."""
    w = np.asarray(w, np.float32)
    if ndim == 2:
        return np.transpose(w, (3, 2, 0, 1))
    return np.transpose(w, (4, 3, 0, 1, 2))


def _sn_v_perm_inv(v, w_oihw_shape, ndim: int):
    """Our v over (*K, I) C-order back to torch's (I, *K) order."""
    v = np.asarray(v, np.float32).reshape(-1)
    if ndim == 2:
        o, i, kh, kw = w_oihw_shape
        idx = np.arange(i * kh * kw).reshape(i, kh, kw)
        perm = np.transpose(idx, (1, 2, 0)).reshape(-1)
    else:
        o, i, kd, kh, kw = w_oihw_shape
        idx = np.arange(i * kd * kh * kw).reshape(i, kd, kh, kw)
        perm = np.transpose(idx, (1, 2, 3, 0)).reshape(-1)
    out = np.empty_like(v)
    out[perm] = v  # inverse of the forward gather v[perm]
    return out


def _j2t_sn(prefix: str, p: Dict, s: Dict, out: Dict, ndim: int) -> None:
    w = _conv_w_inv(p["snconv"]["w"], ndim)
    out[f"{prefix}.weight_orig"] = w
    out[f"{prefix}.bias"] = np.asarray(p["snconv"]["b"], np.float32)
    out[f"{prefix}.weight_u"] = np.asarray(s["sn"]["u"], np.float32)
    out[f"{prefix}.weight_v"] = _sn_v_perm_inv(s["sn"]["v"], w.shape, ndim)


def _j2t_stack(prefix: str, p: Dict, s: Dict, out: Dict, ndim: int) -> None:
    for i, (bp, bs) in enumerate(zip(p["blocks"], s["blocks"])):
        name = "head" if i == 0 else f"block{i - 1}"
        out[f"{prefix}.{name}.conv.weight"] = _conv_w_inv(
            bp["conv"]["w"], ndim)
        out[f"{prefix}.{name}.conv.bias"] = np.asarray(bp["conv"]["b"],
                                                       np.float32)
        out[f"{prefix}.{name}.norm.weight"] = np.asarray(bp["bn"]["gamma"],
                                                         np.float32)
        out[f"{prefix}.{name}.norm.bias"] = np.asarray(bp["bn"]["beta"],
                                                       np.float32)
        out[f"{prefix}.{name}.norm.running_mean"] = np.asarray(
            bs["bn"]["mean"], np.float32)
        out[f"{prefix}.{name}.norm.running_var"] = np.asarray(
            bs["bn"]["var"], np.float32)
    out[f"{prefix}.tail.weight"] = _conv_w_inv(p["tail"]["w"], ndim)
    out[f"{prefix}.tail.bias"] = np.asarray(p["tail"]["b"], np.float32)


def j2t_HPVAEGAN(params: Dict, state: Dict, ndim: int = 2) -> Dict:
    """Our (params, state) pytree -> a torch-style state_dict in the
    original hp-vae-gan naming (exact inverse of p2j_HPVAEGAN)."""
    out: Dict = {}
    for i, (fp, fs) in enumerate(zip(params["encode"]["features"],
                                     state["encode"]["features"])):
        _j2t_sn(f"encode.features.conv_block_{i}.conv", fp, fs, out, ndim)
    for head in ("mu", "logvar", "bern"):
        if head in params["encode"]:
            out[f"encode.{head}.conv.weight"] = _conv_w_inv(
                params["encode"][head]["w"], ndim)
            out[f"encode.{head}.conv.bias"] = np.asarray(
                params["encode"][head]["b"], np.float32)
    _j2t_stack("decoder", params["decoder"], state["decoder"], out, ndim)
    for k, (sp, ss) in enumerate(zip(params["body"], state["body"])):
        _j2t_stack(f"body.{k}", sp, ss, out, ndim)
    return out


def t2m_HPVAEGAN(sd: Dict, ndim: int = 2) -> Dict:
    """Torch state_dict -> MindSpore parameter names (the reference's
    p2m_HPVAEGAN_2d/3d, pt2ms.py:30-89,129-188, with two generalizations:
    the tail index is the stack's actual num_layer+1 instead of the
    hardcoded 6, and the nb Bernoulli head maps symmetrically to _bern —
    the reference never converts nb models)."""
    bn = "1.bn2d." if ndim == 3 else "1."
    # tail index per stack prefix = number of non-tail blocks
    n_blocks: Dict[str, int] = {}
    for key in sd:
        m = re.match(r"((?:decoder)|(?:body\.\d+))\.block(\d+)\.", key)
        if m:
            n_blocks[m.group(1)] = max(n_blocks.get(m.group(1), 0),
                                       int(m.group(2)) + 1)
    new: Dict = {}
    for key, value in sd.items():
        value = np.asarray(value, np.float32)
        if "num_batches_tracked" in key:
            continue
        if key.startswith("encode."):
            m = re.search(r"features\.conv_block_(\d+)\.", key)
            if m:
                key = key.replace(m.group(0), f"_features.{m.group(1)}.")
            elif "mu" in key:
                key = key.replace("mu.", "_mu.", 1)
            elif "logvar" in key:
                key = key.replace("logvar.", "_logvar.", 1)
            elif "bern" in key:
                key = key.replace("bern.", "_bern.", 1)
            if "conv." in key:
                key = key.replace("conv.", "0.", 1)
                key = key.replace("weight_orig", "weight", 1)
        if key.startswith(("decoder.", "body.")):
            stack = key.split(".head")[0].split(".block")[0].split(".tail")[0]
            m = re.match(r"body\.(\d+)\.", key)
            if m and int(m.group(1)) != 0:
                key = key.replace("body.", "body.0.0.", 1)
            if ".head." in key:
                key = key.replace("head.", "0.", 1)
            elif re.search(r"block(\d+)\.", key):
                m2 = re.search(r"block(\d+)\.", key)
                key = key.replace(m2.group(0), f"{int(m2.group(1)) + 1}.", 1)
            elif ".tail." in key:
                # a stack with NO block layers (num_layer=0) has head=0,
                # tail=1 — the fallback must be 0 middle blocks, not the
                # reference's default num_layer
                key = key.replace("tail.", f"{n_blocks.get(stack, 0) + 1}.",
                                  1)
            if "conv." in key:
                key = key.replace("conv.", "0.", 1)
            elif "norm." in key:
                key = key.replace("norm.", bn, 1)
                for a, b in (("weight", "gamma"), ("bias", "beta"),
                             ("running_mean", "moving_mean"),
                             ("running_var", "moving_variance")):
                    if key.endswith(a):
                        key = key[:-len(a)] + b
                        break
        if "weight_u" in key or "weight_v" in key:
            value = value.reshape(-1, 1)  # MS stores column vectors
        new[key] = value
    return new


def j2m_HPVAEGAN(params: Dict, state: Dict, ndim: int = 2) -> Dict:
    """Our pytree -> MindSpore parameter dict, ready for
    tools.ms_ckpt.save_ms_checkpoint — TPU-trained generators handed back
    to the reference's MindSpore tooling (reverse migration)."""
    return t2m_HPVAEGAN(j2t_HPVAEGAN(params, state, ndim=ndim), ndim=ndim)


def load_intermediate(netG_pth) -> Dict:
    """{noise_amps, scale_idx} from a torch checkpoint
    (reference: pt2ms.py:195-197)."""
    return {"noise_amps": list(map(float, netG_pth["noise_amps"])),
            "scale_idx": int(netG_pth["scale"])}


def load_torch_checkpoint(path: str):
    """torch.load with CPU mapping (torch is an optional dependency,
    reference eval_image.py:157-158)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)
