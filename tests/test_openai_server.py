"""OpenAI server e2e: routes, auth, streaming (CPU, tiny model).

ref: sarathi-lean api_server.py routes :41-74 + api-key middleware
:104-106; the reference has no server tests -- we do (SURVEY §4).
"""

import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from vattention_tpu.engine.async_llm_engine import AsyncLLMEngine
from vattention_tpu.entrypoints.openai_server.api_server import OpenAIServer


@pytest.fixture(scope="module")
def engine():
    from vattention_tpu.metrics.metrics_store import MetricsStore

    MetricsStore._instance = None
    eng = AsyncLLMEngine.from_engine_args(
        model="tiny-llama-debug", dtype="float32",
        attention_backend="fa_vattn", scheduler_type="sarathi",
        max_model_len=512, max_batch_size=4, max_num_seqs=4,
        chunk_size=128, max_logprobs=3)
    yield eng
    eng.engine.cleanup()
    MetricsStore._instance = None


def _run(engine, api_key, fn):
    async def body():
        server = OpenAIServer(engine, "tiny-llama-debug", api_key,
                              max_logprobs=3)
        client = TestClient(TestServer(server.app()))
        await client.start_server()
        try:
            return await fn(client)
        finally:
            await client.close()

    return asyncio.new_event_loop().run_until_complete(body())


def test_health_and_models(engine):
    async def fn(client):
        r = await client.get("/health")
        assert r.status == 200
        r = await client.get("/v1/models")
        data = await r.json()
        assert data["data"][0]["id"] == "tiny-llama-debug"

    _run(engine, None, fn)


def test_api_key_middleware(engine):
    async def fn(client):
        r = await client.get("/v1/models")
        assert r.status == 401
        r = await client.get(
            "/v1/models", headers={"Authorization": "Bearer sk-test"})
        assert r.status == 200

    _run(engine, "sk-test", fn)


def test_completion_token_ids(engine):
    async def fn(client):
        r = await client.post("/v1/completions", json={
            "model": "tiny-llama-debug",
            "prompt": list(range(5, 37)),
            "max_tokens": 4,
            "temperature": 0.0,
            "ignore_eos": True,
        })
        assert r.status == 200, await r.text()
        data = await r.json()
        choice = data["choices"][0]
        toks = json.loads(choice["text"])
        assert len(toks) == 4 and all(isinstance(t, int) for t in toks)
        assert data["usage"]["completion_tokens"] == 4

    _run(engine, None, fn)


def test_completion_streaming(engine):
    async def fn(client):
        r = await client.post("/v1/completions", json={
            "model": "tiny-llama-debug",
            "prompt": list(range(7, 41)),
            "max_tokens": 3,
            "temperature": 0.0,
            "ignore_eos": True,
            "stream": True,
        })
        assert r.status == 200
        raw = (await r.read()).decode()
        events = [line[len("data: "):] for line in raw.splitlines()
                  if line.startswith("data: ")]
        assert events[-1] == "[DONE]"
        payloads = [json.loads(e) for e in events[:-1]]
        assert payloads, raw
        assert payloads[-1]["choices"][0]["finish_reason"] == "length"

    _run(engine, None, fn)


def test_completion_logprobs(engine):
    """`logprobs: k` returns per-token logprobs + top-k alternatives;
    greedy sampling means the chosen token IS the top-1 alternative."""
    async def fn(client):
        r = await client.post("/v1/completions", json={
            "model": "tiny-llama-debug",
            "prompt": list(range(9, 43)),
            "max_tokens": 3,
            "temperature": 0.0,
            "ignore_eos": True,
            "logprobs": 2,
        })
        assert r.status == 200, await r.text()
        data = await r.json()
        lp = data["choices"][0]["logprobs"]
        assert len(lp["tokens"]) == 3
        assert len(lp["token_logprobs"]) == 3
        for x, top in zip(lp["token_logprobs"], lp["top_logprobs"]):
            assert isinstance(x, float) and x <= 0.0
            assert 1 <= len(top) <= 2
            # greedy: the sampled token's logprob equals the best
            # alternative's
            assert abs(x - max(top.values())) < 1e-4
        # over the server's --max-logprobs -> 400
        r = await client.post("/v1/completions", json={
            "model": "tiny-llama-debug", "prompt": [1, 2, 3],
            "max_tokens": 1, "logprobs": 9,
        })
        assert r.status == 400

    _run(engine, None, fn)


def test_completion_n_choices(engine):
    async def fn(client):
        r = await client.post("/v1/completions", json={
            "model": "tiny-llama-debug",
            "prompt": list(range(11, 45)),
            "max_tokens": 2,
            "temperature": 0.0,
            "ignore_eos": True,
            "n": 2,
        })
        assert r.status == 200, await r.text()
        data = await r.json()
        assert [c["index"] for c in data["choices"]] == [0, 1]
        # greedy -> both choices decode identical tokens
        assert data["choices"][0]["text"] == data["choices"][1]["text"]
        assert data["usage"]["completion_tokens"] == 4

    _run(engine, None, fn)


def test_completion_best_of(engine):
    async def fn(client):
        r = await client.post("/v1/completions", json={
            "model": "tiny-llama-debug",
            "prompt": list(range(13, 47)),
            "max_tokens": 2,
            "temperature": 0.8,
            "ignore_eos": True,
            "n": 1,
            "best_of": 3,
        })
        assert r.status == 200, await r.text()
        data = await r.json()
        assert len(data["choices"]) == 1
        # usage counts every sampled candidate (OpenAI semantics)
        assert data["usage"]["completion_tokens"] == 6

    _run(engine, None, fn)


def test_stream_include_usage(engine):
    async def fn(client):
        r = await client.post("/v1/completions", json={
            "model": "tiny-llama-debug",
            "prompt": list(range(15, 49)),
            "max_tokens": 2,
            "temperature": 0.0,
            "ignore_eos": True,
            "stream": True,
            "stream_options": {"include_usage": True},
        })
        assert r.status == 200
        raw = (await r.read()).decode()
        events = [line[len("data: "):] for line in raw.splitlines()
                  if line.startswith("data: ")]
        assert events[-1] == "[DONE]"
        last = json.loads(events[-2])
        assert last["choices"] == []
        assert last["usage"]["completion_tokens"] == 2

    _run(engine, None, fn)


def test_chat_completion(engine):
    async def fn(client):
        r = await client.post("/v1/chat/completions", json={
            "model": "tiny-llama-debug",
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 2,
            "temperature": 0.0,
            "ignore_eos": True,
        })
        # tokenizer-less server cannot encode the templated string
        assert r.status == 400
        data = await r.json()
        assert "tokenizer-less" in data["error"]["message"]

    _run(engine, None, fn)
