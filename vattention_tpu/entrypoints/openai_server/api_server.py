"""OpenAI-compatible HTTP server (aiohttp).

ref: sarathi-lean/sarathi/entrypoints/openai_server/api_server.py:32-110
(FastAPI there; aiohttp here -- fastapi is not in the base image).
Routes: /v1/completions, /v1/chat/completions, /v1/models, /health
(ref :41-74); optional api-key middleware (ref :104-106); SSE streaming.

Run: python -m vattention_tpu.entrypoints.openai_server.api_server \
        --model <local-hf-dir-or-registry-name> [--port 8000]
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Optional

from aiohttp import web

from vattention_tpu.engine.async_llm_engine import AsyncLLMEngine
from vattention_tpu.entrypoints.openai_server.protocol import (
    ChatCompletionRequest, CompletionRequest, chat_response,
    chat_stream_chunk, completion_response, completion_stream_chunk,
    error_response, random_id)
from vattention_tpu.logger import init_logger

logger = init_logger(__name__)


class OpenAIServer:
    def __init__(self, engine: AsyncLLMEngine, served_model: str,
                 api_key: Optional[str] = None):
        self.engine = engine
        self.served_model = served_model
        self.api_key = api_key

    # ------------------------------------------------------------------ #
    def app(self) -> web.Application:
        app = web.Application(middlewares=[self._auth_middleware])
        app.router.add_get("/health", self.health)
        app.router.add_get("/v1/models", self.models)
        app.router.add_post("/v1/completions", self.completions)
        app.router.add_post("/v1/chat/completions", self.chat_completions)
        return app

    @web.middleware
    async def _auth_middleware(self, request, handler):
        if self.api_key and request.path.startswith("/v1"):
            auth = request.headers.get("Authorization", "")
            if auth != f"Bearer {self.api_key}":
                return web.json_response(
                    error_response("invalid api key", 401), status=401)
        return await handler(request)

    # ------------------------------------------------------------------ #
    async def health(self, request) -> web.Response:
        return web.json_response({"status": "ok"})

    async def models(self, request) -> web.Response:
        return web.json_response({
            "object": "list",
            "data": [{"id": self.served_model, "object": "model",
                      "created": int(time.time()),
                      "owned_by": "vattention-tpu"}],
        })

    def _encode_prompt(self, prompt):
        tokenizer = self.engine.get_tokenizer()
        if isinstance(prompt, list):
            return None, prompt
        if tokenizer is None:
            raise ValueError(
                "server running tokenizer-less; pass prompt as token ids")
        return prompt, tokenizer.encode(prompt)

    # ------------------------------------------------------------------ #
    async def completions(self, request) -> web.StreamResponse:
        try:
            body = CompletionRequest.from_dict(await request.json())
            prompt, token_ids = self._encode_prompt(body.prompt)
        except Exception as e:  # noqa: BLE001
            return web.json_response(error_response(str(e)), status=400)
        request_id = random_id("cmpl")
        gen = self.engine.generate(
            prompt, body.to_sampling_params(), request_id=request_id,
            prompt_token_ids=token_ids)

        if body.stream:
            resp = web.StreamResponse(headers={
                "Content-Type": "text/event-stream"})
            await resp.prepare(request)
            sent = 0
            async for out in gen:
                delta = out.text[sent:]
                sent = len(out.text)
                chunk = completion_stream_chunk(
                    request_id, self.served_model, delta,
                    out.finish_reason if out.finished else None)
                await resp.write(
                    f"data: {json.dumps(chunk)}\n\n".encode())
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp

        final = None
        async for out in gen:
            final = out
        text = final.text if final.text else json.dumps(final.token_ids)
        return web.json_response(completion_response(
            request_id, self.served_model, text,
            final.finish_reason, len(final.prompt_token_ids),
            len(final.token_ids)))

    # ------------------------------------------------------------------ #
    def _apply_chat_template(self, messages) -> str:
        tokenizer = self.engine.get_tokenizer()
        if tokenizer is not None and getattr(
                tokenizer, "chat_template", None):
            return tokenizer.apply_chat_template(
                messages, tokenize=False, add_generation_prompt=True)
        # minimal fallback template (ref serving_chat.py behavior)
        parts = [f"{m['role']}: {m['content']}" for m in messages]
        parts.append("assistant:")
        return "\n".join(parts)

    async def chat_completions(self, request) -> web.StreamResponse:
        try:
            body = ChatCompletionRequest.from_dict(await request.json())
            prompt = self._apply_chat_template(body.messages)
            _, token_ids = self._encode_prompt(prompt)
        except Exception as e:  # noqa: BLE001
            return web.json_response(error_response(str(e)), status=400)
        request_id = random_id("chatcmpl")
        gen = self.engine.generate(
            prompt, body.to_sampling_params(), request_id=request_id,
            prompt_token_ids=token_ids)

        if body.stream:
            resp = web.StreamResponse(headers={
                "Content-Type": "text/event-stream"})
            await resp.prepare(request)
            sent = 0
            async for out in gen:
                delta = out.text[sent:]
                sent = len(out.text)
                chunk = chat_stream_chunk(
                    request_id, self.served_model, delta,
                    out.finish_reason if out.finished else None)
                await resp.write(
                    f"data: {json.dumps(chunk)}\n\n".encode())
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp

        final = None
        async for out in gen:
            final = out
        text = final.text if final.text else json.dumps(final.token_ids)
        return web.json_response(chat_response(
            request_id, self.served_model, text, final.finish_reason,
            len(final.prompt_token_ids), len(final.token_ids)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--api-key", default=None)
    p.add_argument("--model", default="tiny-llama-debug")
    p.add_argument("--attention-backend", default="fa_vattn")
    p.add_argument("--scheduler-type", default="sarathi")
    p.add_argument("--max-model-len", type=int, default=None)
    p.add_argument("--max-batch-size", type=int, default=32)
    p.add_argument("--chunk-size", type=int, default=512)
    p.add_argument("--load-format", default="dummy")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    engine = AsyncLLMEngine.from_engine_args(
        model=args.model, attention_backend=args.attention_backend,
        scheduler_type=args.scheduler_type,
        max_model_len=args.max_model_len,
        max_batch_size=args.max_batch_size,
        max_num_seqs=args.max_batch_size,
        chunk_size=args.chunk_size, load_format=args.load_format)
    server = OpenAIServer(engine, args.model, args.api_key)
    logger.info("serving %s on http://%s:%d", args.model, args.host,
                args.port)
    web.run_app(server.app(), host=args.host, port=args.port,
                print=None)


if __name__ == "__main__":
    main()
