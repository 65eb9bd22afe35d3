"""Model-specific MLLM adapter prompt shapes, tested with fakes (no weights).

The reference ships three adapters whose prompt/processor conventions differ
(mllm_server.py:125-367): Qwen chat-template messages, the literal LLaVA
USER/ASSISTANT conversation string, and InternVL's model.chat() with
448x448 ImageNet-normalized pixel tensors. These tests pin each convention.
"""

import numpy as np
from PIL import Image

from sage3d_tpu.serve.mllm_server import (InternVLAdapter, LLaVAAdapter,
                                          MODEL_ADAPTERS, QwenVLAdapter,
                                          VLNPromptTemplate, make_hf_adapter)


def _image(w=64, h=48, value=128):
    return Image.fromarray(np.full((h, w, 3), value, np.uint8))


class _FakeTensorDict(dict):
    def to(self, device):
        return self


class _FakeQwenProcessor:
    def __init__(self):
        self.calls = {}

    def apply_chat_template(self, messages, tokenize=False,
                            add_generation_prompt=False):
        self.calls["messages"] = messages
        assert not tokenize and add_generation_prompt
        parts = []
        for m in messages:
            c = m["content"]
            if isinstance(c, str):
                parts.append(f"<|{m['role']}|>{c}")
            else:
                for item in c:
                    parts.append("<img>" if item["type"] == "image"
                                 else item["text"])
        return "".join(parts) + "<|assistant|>"

    def __call__(self, text, images=None, return_tensors=None, padding=False):
        self.calls["text"] = text
        self.calls["images"] = images
        return _FakeTensorDict(input_ids=[[1, 2, 3, 4]])

    def batch_decode(self, seqs, skip_special_tokens=True):
        return ["decoded:" + ",".join(str(x) for x in s) for s in seqs]


class _FakeQwenModel:
    device = None

    def generate(self, input_ids, max_new_tokens):
        return [list(i) + [7, 8] for i in input_ids]


def test_qwen_adapter_chat_template_and_trim():
    proc = _FakeQwenProcessor()
    a = QwenVLAdapter(model=_FakeQwenModel(), processor=proc)
    out = a.generate_response([_image()], "go to the sofa")
    # system turn first, image slot inline in the user turn
    msgs = proc.calls["messages"]
    assert msgs[0] == {"role": "system", "content": VLNPromptTemplate.SYSTEM}
    assert msgs[1]["content"][0]["type"] == "image"
    assert "go to the sofa" in msgs[1]["content"][1]["text"]
    # batched text + images lists (Qwen processor contract)
    assert isinstance(proc.calls["text"], list)
    assert isinstance(proc.calls["images"], list)
    # only NEW ids decoded (input trimmed)
    assert out == "decoded:7,8"


class _FakeLLaVAProcessor:
    def __init__(self):
        self.prompt = None

    def __call__(self, text, images=None, return_tensors=None):
        self.prompt = text
        ids = np.zeros((1, 5), np.int64)
        return _FakeTensorDict(input_ids=ids)

    def decode(self, seq, skip_special_tokens=True):
        return "decoded:" + ",".join(str(int(x)) for x in seq)


class _FakeLLaVAModel:
    device = None

    def generate(self, input_ids, max_new_tokens):
        n = input_ids.shape[1]
        return np.concatenate([input_ids, np.full((1, 2), 9)], axis=1)


def test_llava_adapter_conversation_string():
    proc = _FakeLLaVAProcessor()
    a = LLaVAAdapter(model=_FakeLLaVAModel(), processor=proc)
    out = a.generate_response([_image()], "turn left at the door")
    assert proc.prompt.startswith("USER: <image>\n")
    assert proc.prompt.endswith("ASSISTANT:")
    assert VLNPromptTemplate.SYSTEM in proc.prompt
    assert "turn left at the door" in proc.prompt
    assert out == "decoded:9,9"


class _FakeInternVLModel:
    device = None

    def __init__(self):
        self.seen = {}

    def chat(self, tokenizer, pixel_values, prompt, config):
        self.seen = {"pixel_values": pixel_values, "prompt": prompt,
                     "config": config}
        return "TURN_RIGHT"


class _FakeTokenizer:
    eos_token_id = 2


def test_internvl_adapter_chat_and_preprocess():
    m = _FakeInternVLModel()
    a = InternVLAdapter(model=m, tokenizer=_FakeTokenizer())
    out = a.generate_response([_image(200, 100, value=255)], "find the lamp")
    assert out == "TURN_RIGHT"
    pv = m.seen["pixel_values"]
    assert tuple(pv.shape) == (1, 3, 448, 448)
    # white pixel normalized by ImageNet stats: (1 - mean) / std per channel
    got = pv[0, :, 0, 0].numpy()
    want = (1.0 - np.array(a.MEAN)) / np.array(a.STD)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert "find the lamp" in m.seen["prompt"]
    assert m.seen["config"]["pad_token_id"] == 2


def test_family_dispatch():
    assert MODEL_ADAPTERS["qwen"] is QwenVLAdapter
    assert MODEL_ADAPTERS["llava"] is LLaVAAdapter
    assert MODEL_ADAPTERS["internvl"] is InternVLAdapter
    # sniffing from the model id picks the right class without loading
    # weights: inject fakes through kwargs
    a = make_hf_adapter("Qwen/Qwen2.5-VL-7B-Instruct",
                        model=_FakeQwenModel(),
                        processor=_FakeQwenProcessor())
    assert isinstance(a, QwenVLAdapter)
    b = make_hf_adapter("llava-hf/llava-1.5-7b-hf",
                        model=_FakeLLaVAModel(),
                        processor=_FakeLLaVAProcessor())
    assert isinstance(b, LLaVAAdapter)
    c = make_hf_adapter("OpenGVLab/InternVL2_5-8B",
                        model=_FakeInternVLModel(),
                        tokenizer=_FakeTokenizer())
    assert isinstance(c, InternVLAdapter)


def test_qwen_llava_text_only_requests():
    """Text-only wire requests (no images) are legal: no image slot in the
    prompt, no images kwarg to the processor (real HF processors raise on
    an image token with no pixels)."""
    proc = _FakeQwenProcessor()
    a = QwenVLAdapter(model=_FakeQwenModel(), processor=proc)
    out = a.generate_response([], "stop at the table")
    assert out == "decoded:7,8"
    msgs = proc.calls["messages"]
    assert all(item["type"] == "text" for item in msgs[1]["content"])
    assert proc.calls["images"] is None  # kwarg omitted -> fake default

    lproc = _FakeLLaVAProcessor()
    b = LLaVAAdapter(model=_FakeLLaVAModel(), processor=lproc)
    out = b.generate_response([], "stop at the table")
    assert out == "decoded:9,9"
    assert "<image>" not in lproc.prompt
    assert lproc.prompt.startswith("USER: ")


def test_server_sends_framed_error_reply():
    """A crashing adapter must still produce a framed STOP reply, not a bare
    connection close (the client would otherwise block until its timeout)."""
    import socket

    from sage3d_tpu.serve.mllm_server import MLLMServer
    from sage3d_tpu.serve.protocol import recv_framed, send_framed

    class _Boom:
        def generate_response(self, images, instruction):
            raise RuntimeError("model exploded")

        def extract_action(self, raw):
            return raw

    srv = MLLMServer(_Boom(), port=0).start()
    try:
        with socket.create_connection(("localhost", srv.port), timeout=10) as c:
            send_framed(c, {"query": "go", "images": []})
            reply = recv_framed(c)
        assert reply["result"] == "STOP"
        assert "model exploded" in reply["error"]
    finally:
        srv.stop()
