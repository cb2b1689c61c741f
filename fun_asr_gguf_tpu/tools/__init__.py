"""Offline toolchain: artifact conversion, quantization, inspection.

TPU-native replacement for the reference's export scripts
(``01/02/03-Export-*.py`` + the vendored 11.4k-LoC convert_hf_to_gguf):
one converter producing our checkpoint directory straight from the
original FunASR artifacts, a q8_0 quantizer (llama-quantize equivalent),
and a GGUF inspector (gguf_dump equivalent).
"""
