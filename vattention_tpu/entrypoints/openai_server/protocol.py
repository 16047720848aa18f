"""OpenAI API protocol datatypes (ref: sarathi-lean openai_server/protocol.py, 367 LoC).

Plain dataclasses (pydantic is not in the base image); validation is
explicit in from_dict.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union


def random_id(prefix: str) -> str:
    return f"{prefix}-{uuid.uuid4().hex[:24]}"


@dataclass
class CompletionRequest:
    model: str
    prompt: Union[str, List[int]]
    max_tokens: int = 16
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    n: int = 1
    stream: bool = False
    stop: Optional[Union[str, List[str]]] = None
    ignore_eos: bool = False

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "CompletionRequest":
        if "prompt" not in d:
            raise ValueError("missing required field: prompt")
        allowed = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in d.items() if k in allowed})

    def to_sampling_params(self):
        from vattention_tpu.core.datatypes.sampling_params import (
            SamplingParams,
        )

        return SamplingParams(
            temperature=self.temperature, top_p=self.top_p,
            top_k=self.top_k, stop=self.stop, ignore_eos=self.ignore_eos,
            max_tokens=self.max_tokens)


@dataclass
class ChatMessage:
    role: str
    content: str


@dataclass
class ChatCompletionRequest:
    model: str
    messages: List[Dict[str, str]]
    max_tokens: int = 256
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    stream: bool = False
    stop: Optional[Union[str, List[str]]] = None

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ChatCompletionRequest":
        if "messages" not in d:
            raise ValueError("missing required field: messages")
        allowed = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in d.items() if k in allowed})

    def to_sampling_params(self):
        from vattention_tpu.core.datatypes.sampling_params import (
            SamplingParams,
        )

        return SamplingParams(
            temperature=self.temperature, top_p=self.top_p,
            top_k=self.top_k, stop=self.stop, max_tokens=self.max_tokens)


def completion_response(request_id: str, model: str, text: str,
                        finish_reason: Optional[str],
                        prompt_tokens: int, completion_tokens: int) -> dict:
    return {
        "id": request_id,
        "object": "text_completion",
        "created": int(time.time()),
        "model": model,
        "choices": [{
            "index": 0,
            "text": text,
            "logprobs": None,
            "finish_reason": finish_reason,
        }],
        "usage": {
            "prompt_tokens": prompt_tokens,
            "completion_tokens": completion_tokens,
            "total_tokens": prompt_tokens + completion_tokens,
        },
    }


def completion_stream_chunk(request_id: str, model: str, text: str,
                            finish_reason: Optional[str]) -> dict:
    return {
        "id": request_id,
        "object": "text_completion",
        "created": int(time.time()),
        "model": model,
        "choices": [{
            "index": 0,
            "text": text,
            "logprobs": None,
            "finish_reason": finish_reason,
        }],
    }


def chat_response(request_id: str, model: str, text: str,
                  finish_reason: Optional[str],
                  prompt_tokens: int, completion_tokens: int) -> dict:
    return {
        "id": request_id,
        "object": "chat.completion",
        "created": int(time.time()),
        "model": model,
        "choices": [{
            "index": 0,
            "message": {"role": "assistant", "content": text},
            "finish_reason": finish_reason,
        }],
        "usage": {
            "prompt_tokens": prompt_tokens,
            "completion_tokens": completion_tokens,
            "total_tokens": prompt_tokens + completion_tokens,
        },
    }


def chat_stream_chunk(request_id: str, model: str, delta: str,
                      finish_reason: Optional[str]) -> dict:
    return {
        "id": request_id,
        "object": "chat.completion.chunk",
        "created": int(time.time()),
        "model": model,
        "choices": [{
            "index": 0,
            "delta": {"content": delta} if delta else {},
            "finish_reason": finish_reason,
        }],
    }


def error_response(message: str, code: int = 400) -> dict:
    return {"error": {"message": message, "type": "invalid_request_error",
                      "code": code}}
