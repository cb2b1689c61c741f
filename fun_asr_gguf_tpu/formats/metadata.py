"""GGUF ``general.*`` metadata heuristics.

Behavioral equivalent of the reference's ``gguf/metadata.py`` (731 LoC,
``fun_asr_gguf/gguf/metadata.py:19-731``) at the scope this framework
uses: decompose a HuggingFace-style model id into naming-convention
components (basename / size label / finetune / version), read the model
card's YAML front matter, assemble the ``general.*`` KV dict, and build
the llama.cpp output-filename convention. The reference additionally
mines base-model lineage across 154 architectures; that breadth is out
of scope (no HF hub access in this environment).

Naming rules follow the llama.cpp/HF convention the reference encodes:
``<Org>/<Basename>-<SizeLabel>-<Finetune>-<Version>`` where a size
label looks like ``7B``/``0.6B``/``8x7B``/``30B-A3B``, a version like
``v1.5``, and everything after the basename that is neither is a
finetune component.
"""

import os
import re
from typing import Dict, List, Optional, Tuple

_VERSION_RE = re.compile(r"(v|iter)?\d+([.]\d+)*", re.IGNORECASE)
_QUANT_RE = re.compile(r"i?q\d(_\w)*|b?fp?(16|32)", re.IGNORECASE)
_SIZE_RE = re.compile(
    r"(([A]|\d+[x])?\d+([._]\d+)?[KMBT][\d]?|small|mini|medium|large|x?xl)",
    re.IGNORECASE)
_FINETUNE_WORDS_RE = re.compile(r"chat|instruct|vision|lora", re.IGNORECASE)
_SCALE = {"K": 1e3, "M": 1e6, "B": 1e9, "T": 1e12}


def size_label(total_params: int, experts: int = 0,
               per_expert_params: int = 0,
               active_params: int = 0) -> str:
    """Parameter count → naming-convention size label.

    The MoE convention sizes ExN models by shared + ONE expert's
    params (Mixtral-8x7B is ~47B total), so the ``Nx`` prefix is only
    emitted when ``per_expert_params`` is known — prefixing the total
    would overstate the size N-fold.

    >>> size_label(596_049_920)
    '0.6B'
    >>> size_label(46_700_000_000, experts=8,
    ...            per_expert_params=5_610_000_000)
    '8x7.4B'
    """
    def _fmt(n: int) -> str:
        for suffix in ("T", "B", "M", "K"):
            if n >= _SCALE[suffix] * 0.1:
                v = n / _SCALE[suffix]
                return (f"{v:.1f}".rstrip("0").rstrip(".")
                        if v < 10 else f"{round(v)}") + suffix
        return str(n)

    if experts > 0 and per_expert_params > 0:
        shared = max(total_params - experts * per_expert_params, 0)
        label = f"{experts}x{_fmt(shared + per_expert_params)}"
    else:
        label = _fmt(abs(total_params))
    if active_params > 0:
        label += f"-A{_fmt(abs(active_params))}"
    return label


def _classify_part(part: str, index: int, total_params: int
                   ) -> Tuple[str, Optional[str]]:
    """One dash-separated name component → (normalized text, kind).

    kind ∈ {version, type, size_label, finetune, None}; None means
    unannotated (resolved to basename/finetune by position later).
    """
    if _VERSION_RE.fullmatch(part):
        return part, "version"
    if _QUANT_RE.fullmatch(part):
        return part.upper(), "type"
    if index > 0 and _SIZE_RE.fullmatch(part):
        part = part.replace("_", ".")
        if part[-1].isdecimal():                     # bloom-7b1 style
            part = part[:-2] + "." + part[-1] + part[-2]
        if len(part) > 1 and part[-2].isdecimal() and part[-1] in "kmbt":
            part = part[:-1] + part[-1].upper()
        if total_params > 0 and part[-1] in _SCALE:
            try:
                labeled = float(re.sub(r"^\d+x|^A", "", part[:-1])) \
                    * _SCALE[part[-1]]
                if abs(labeled - total_params) > 7 * total_params // 8:
                    # a number that is nowhere near the weight count is
                    # most likely a context length ("32k"), not a size
                    return part[:-1] + part[-1].lower(), "finetune"
            except ValueError:
                pass
        return part, "size_label"
    if index > 0 and _FINETUNE_WORDS_RE.fullmatch(part):
        return part, "finetune"
    return part, None


def parse_model_id(model_id: Optional[str], total_params: int = 0):
    """Model id → (name, org, basename, finetune, version, size_label).

    Mirrors the reference's annotation pass
    (``gguf/metadata.py:240-363``): leading unannotated/version parts
    form the basename, numeric size labels win over word-based ones,
    trailing versions split out, remaining middle parts are finetunes.
    """
    none6 = (None,) * 6
    if model_id is None:
        return none6
    if " " in model_id:                    # free-text name, not an id
        return (model_id,) + none6[1:]
    org, name = model_id.split("/", 1) if "/" in model_id \
        else (None, model_id)
    if org is not None and (not org or org[0] == "."):
        org = None

    parts = [p for p in name.split("-") if p]
    annotated: List[Tuple[str, Optional[str]]] = [
        _classify_part(p, i, total_params) for i, p in enumerate(parts)]

    # numeric size labels demote word-based ones ("large") to finetune
    if any(k == "size_label" and any(c.isdecimal() for c in p)
           for p, k in annotated):
        annotated = [(p, "finetune" if k == "size_label"
                      and p.isalpha() else k) for p, k in annotated]

    # leading run of unannotated/version parts = basename
    kinds: List[str] = []
    at_start = True
    for p, k in annotated:
        if at_start and ((k is None and p[:1].isalpha()) or k == "version"):
            kinds.append("basename")
            continue
        at_start = False
        kinds.append(k or "finetune")
    # a trailing version should stay a version even at the start run
    for i in range(len(kinds) - 1, -1, -1):
        if kinds[i] == "basename" and annotated[i][1] == "version":
            kinds[i] = "version"
        else:
            break

    def _join(kind):
        seen = dict.fromkeys(
            p for (p, _), k in zip(annotated, kinds) if k == kind)
        return "-".join(seen) or None

    basename = _join("basename")
    size = _join("size_label")
    finetune = _join("finetune")
    version = _join("version")
    if size is None and finetune is None and version is None:
        basename = None                    # too ambiguous to decompose
    return name, org, basename, finetune, version, size


def load_model_card(model_dir: str) -> Dict:
    """README.md YAML front matter → dict (empty when absent)."""
    path = os.path.join(model_dir, "README.md")
    if not os.path.isfile(path):
        return {}
    with open(path, encoding="utf-8") as f:
        text = f.read()
    if not text.startswith("---\n"):
        return {}
    end = text.find("\n---", 4)
    if end < 0:
        return {}
    try:
        import yaml
        data = yaml.safe_load(text[4:end])
        return data if isinstance(data, dict) else {}
    except Exception:
        return {}


def metadata_kvs(model_dir: Optional[str] = None,
                 model_id: Optional[str] = None,
                 total_params: int = 0,
                 experts: int = 0,
                 per_expert_params: int = 0) -> Dict[str, object]:
    """Assemble the ``general.*`` KV dict for a GGUF export.

    model_id defaults to the checkpoint directory's name; model-card
    front matter contributes license/tags/languages/datasets the way
    ``Metadata.apply_metadata_heuristic`` does.
    """
    card = load_model_card(model_dir) if model_dir else {}
    if model_id is None and model_dir:
        model_id = os.path.basename(os.path.normpath(model_dir))
    name, org, basename, finetune, version, size = parse_model_id(
        model_id, total_params)

    kvs: Dict[str, object] = {}
    pretty = (name or "").replace("-", " ").replace("_", " ")
    if pretty:
        kvs["general.name"] = pretty
    if org:
        kvs["general.organization"] = org.replace("-", " ")
    if basename:
        kvs["general.basename"] = basename
    if finetune:
        kvs["general.finetune"] = finetune
    if version:
        kvs["general.version"] = version
    if size:
        kvs["general.size_label"] = size
    elif total_params > 0:
        kvs["general.size_label"] = size_label(
            total_params, experts=experts,
            per_expert_params=per_expert_params)
    for card_key, kv_key in (("license", "general.license"),
                             ("license_name", "general.license.name"),
                             ("license_link", "general.license.link"),
                             ("tags", "general.tags"),
                             ("language", "general.languages"),
                             ("datasets", "general.datasets")):
        val = card.get(card_key)
        if isinstance(val, str) or (isinstance(val, list) and val
                                    and all(isinstance(x, str)
                                            for x in val)):
            kvs[kv_key] = val
    # explicit model-card naming overrides the id-decomposition defaults
    # (reference Metadata.apply_metadata_heuristic precedence: card >
    # directory-name heuristics)
    if isinstance(card.get("model_name"), str):
        kvs["general.name"] = card["model_name"]
    if isinstance(card.get("model_creator"), str):
        kvs["general.organization"] = card["model_creator"]
    if org and model_id and "/" in model_id:
        # org is only ever set for org-qualified ids, so the repo name
        # is exactly the part after the slash
        kvs["general.repo_url"] = \
            f"https://huggingface.co/{org}/{model_id.split('/', 1)[1]}" 
    # base-model lineage (reference: general.base_model.N.* from the
    # card's base_model entry — a model id string or a list of them)
    base = card.get("base_model")
    if isinstance(base, str):
        base = [base]
    if isinstance(base, list) and base \
            and all(isinstance(x, str) for x in base):
        kvs["general.base_model.count"] = len(base)
        for i, bid in enumerate(base):
            (_bname, borg, bbase, _bft, _bver, _bsz) = parse_model_id(
                bid.rstrip("/").split("/")[-1], 0)
            kvs[f"general.base_model.{i}.name"] = \
                (bbase or bid.split("/")[-1]).replace("-", " ")
            if "/" in bid:
                kvs[f"general.base_model.{i}.organization"] = \
                    bid.split("/")[0].replace("-", " ")
                kvs[f"general.base_model.{i}.repo_url"] = \
                    f"https://huggingface.co/{bid}"
    return kvs


def naming_convention(basename: Optional[str], size: Optional[str],
                      finetune: Optional[str], version: Optional[str],
                      encoding: Optional[str] = None) -> str:
    """llama.cpp output-filename convention:
    ``<Basename>-<Size>-<Finetune>-<Version>-<Encoding>.gguf``."""
    parts = [basename or "model", size, finetune, version,
             encoding.upper() if encoding else None]
    return "-".join(p.strip().replace(" ", "-")
                    for p in parts if p) + ".gguf"
