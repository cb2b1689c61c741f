"""GGUF general.* metadata heuristics (formats/metadata.py) against the
naming-convention behavior of the reference's gguf/metadata.py."""

from fun_asr_gguf_tpu.formats.metadata import (load_model_card,
                                               metadata_kvs,
                                               naming_convention,
                                               parse_model_id, size_label)


def test_parse_hf_style_ids():
    name, org, base, ft, ver, size = parse_model_id(
        "mistralai/Mistral-7B-Instruct-v0.2")
    assert (name, org) == ("Mistral-7B-Instruct-v0.2", "mistralai")
    assert (base, size, ft, ver) == ("Mistral", "7B", "Instruct", "v0.2")

    _n, _o, base, ft, ver, size = parse_model_id("Qwen/Qwen3-0.6B")
    assert (base, size, ft, ver) == ("Qwen3", "0.6B", None, None)

    _n, _o, base, ft, ver, size = parse_model_id(
        "Mixtral-8x7B-Instruct-v0.1")
    assert (base, size, ft, ver) == ("Mixtral", "8x7B", "Instruct", "v0.1")

    _n, _o, base, ft, ver, size = parse_model_id("TinyLlama-1.1B-Chat-v1.0")
    assert (base, size, ft, ver) == ("TinyLlama", "1.1B", "Chat", "v1.0")


def test_parse_ambiguous_and_freetext():
    # nothing recognizable -> no decomposition
    assert parse_model_id("input")[2:] == (None, None, None, None)
    # a sentence is a display name, not an id
    name, org, base, *_ = parse_model_id("My Cool Model")
    assert name == "My Cool Model" and org is None and base is None
    assert parse_model_id(None) == (None,) * 6


def test_context_length_is_not_a_size():
    # 32k is ~1/200000 of 7B weights: a context length, not a size label
    _n, _o, base, ft, _v, size = parse_model_id(
        "NewModel-32k-instruct", total_params=7_000_000_000)
    assert base == "NewModel" and size is None
    assert ft == "32k-instruct"


def test_size_label_formatting():
    assert size_label(596_049_920) == "0.6B"
    assert size_label(7_241_732_096) == "7.2B"
    assert size_label(1_100_048_384) == "1.1B"
    assert size_label(68_000_000_000) == "68B"
    assert size_label(52_000_000) == "52M"
    # MoE: ExN sizes by shared + ONE expert (Mixtral-8x7B is 47B total:
    # ~1.8B shared + 8 x ~5.6B expert MLPs -> each "replica" ~7.4B)
    assert size_label(46_700_000_000, experts=8,
                      per_expert_params=5_610_000_000) == "8x7.4B"
    # without the per-expert split the Nx prefix would overstate Nx:
    # fall back to the plain total
    assert size_label(30_532_122_624, experts=128,
                      active_params=3_300_000_000) == "31B-A3.3B"


def test_metadata_kvs_and_model_card(tmp_path):
    (tmp_path / "README.md").write_text(
        "---\nlicense: apache-2.0\nlanguage:\n- en\n- zh\n"
        "tags:\n- asr\n---\n# hi\n")
    d = tmp_path / "Qwen3-0.6B"
    d.mkdir()
    kvs = metadata_kvs(str(d), total_params=596_049_920)
    assert kvs["general.name"] == "Qwen3 0.6B"
    assert kvs["general.basename"] == "Qwen3"
    assert kvs["general.size_label"] == "0.6B"
    card_kvs = metadata_kvs(str(tmp_path), model_id="Foo-1B")
    assert card_kvs["general.license"] == "apache-2.0"
    assert card_kvs["general.languages"] == ["en", "zh"]
    assert card_kvs["general.tags"] == ["asr"]
    assert load_model_card(str(d)) == {}


def test_metadata_size_label_falls_back_to_weight_count(tmp_path):
    d = tmp_path / "MyNet-instruct"
    d.mkdir()
    kvs = metadata_kvs(str(d), total_params=1_700_000_000)
    assert kvs["general.size_label"] == "1.7B"


def test_naming_convention():
    assert naming_convention("Qwen3", "0.6B", None, None, "q8_0") \
        == "Qwen3-0.6B-Q8_0.gguf"
    assert naming_convention("Mixtral", "8x7B", "Instruct", "v0.1", "f16") \
        == "Mixtral-8x7B-Instruct-v0.1-F16.gguf"
    assert naming_convention(None, None, None, None) == "model.gguf"


def test_save_gguf_embeds_general_metadata(tmp_path):
    import jax
    import jax.numpy as jnp

    from fun_asr_gguf_tpu.formats.gguf import GGUFReader
    from fun_asr_gguf_tpu.models.config import Qwen3Config
    from fun_asr_gguf_tpu.models.loaders import save_qwen3_to_gguf
    from fun_asr_gguf_tpu.models.qwen3 import init_qwen3_params

    # NB: no size label in the name — the tiny test model's real weight
    # count would demote any plausible label to a context-length
    # finetune (the reference's own closeness rule)
    hf = tmp_path / "Tiny-Chat-v1.0"
    hf.mkdir()
    cfg = Qwen3Config(hidden=64, n_layers=1, q_heads=2, kv_heads=1,
                      head_dim=32, ffn_dim=96, vocab_size=64)
    params = init_qwen3_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    gp = str(tmp_path / "out.gguf")
    save_qwen3_to_gguf(gp, params, cfg, quantize_q8_0=False,
                       hf_dir=str(hf))
    fields = GGUFReader(gp).fields
    assert fields["general.basename"] == "Tiny"
    assert fields["general.finetune"] == "Chat"
    assert fields["general.version"] == "v1.0"
    assert fields["general.name"] == "Tiny Chat v1.0"


class TestModelCardLineage:
    def _dir_with_card(self, tmp_path, card_yaml, name="Qwen3-0.6B"):
        d = tmp_path / name
        d.mkdir()
        (d / "README.md").write_text(f"---\n{card_yaml}\n---\n# hi\n")
        return str(d)

    def test_base_model_lineage(self, tmp_path):
        from fun_asr_gguf_tpu.formats.metadata import metadata_kvs
        d = self._dir_with_card(
            tmp_path,
            "base_model: Qwen/Qwen3-0.6B-Base\nlicense: apache-2.0")
        kvs = metadata_kvs(d, total_params=596_049_920)
        assert kvs["general.base_model.count"] == 1
        assert kvs["general.base_model.0.organization"] == "Qwen"
        assert kvs["general.base_model.0.repo_url"] == \
            "https://huggingface.co/Qwen/Qwen3-0.6B-Base"
        assert kvs["general.license"] == "apache-2.0"

    def test_base_model_list_and_overrides(self, tmp_path):
        from fun_asr_gguf_tpu.formats.metadata import metadata_kvs
        d = self._dir_with_card(
            tmp_path,
            "base_model:\n- org-a/Model-A-7B\n- org-b/Model-B-7B\n"
            "model_name: Fancy Name\nmodel_creator: Some Lab")
        kvs = metadata_kvs(d)
        assert kvs["general.base_model.count"] == 2
        assert kvs["general.base_model.1.organization"] == "org b"
        assert kvs["general.name"] == "Fancy Name"
        assert kvs["general.organization"] == "Some Lab"

    def test_no_card_no_lineage(self, tmp_path):
        from fun_asr_gguf_tpu.formats.metadata import metadata_kvs
        d = tmp_path / "Llama-3-8B"
        d.mkdir()
        kvs = metadata_kvs(str(d), total_params=8_000_000_000)
        assert "general.base_model.count" not in kvs
        assert kvs["general.size_label"] == "8B"
