"""AsyncLLMEngine: asyncio wrapper for online serving.

ref: sarathi-lean/sarathi/engine/async_llm_engine.py:27-290 --
RequestTracker + per-request AsyncStream, background loop running
``engine.step`` in an executor thread.
"""

from __future__ import annotations

import asyncio
import time
from typing import AsyncIterator, Dict, List, Optional

from vattention_tpu.core.datatypes.request_output import RequestOutput
from vattention_tpu.core.datatypes.sampling_params import SamplingParams
from vattention_tpu.engine.base_llm_engine import BaseLLMEngine
from vattention_tpu.logger import init_logger
from vattention_tpu.utils.counter import Counter

logger = init_logger(__name__)


class AsyncStream:
    """Per-request output stream (ref async_llm_engine.py AsyncStream)."""

    def __init__(self, seq_id: str):
        self.seq_id = seq_id
        self._queue: asyncio.Queue = asyncio.Queue()
        self._finished = False

    def put(self, item) -> None:
        if self._finished:
            return
        self._queue.put_nowait(item)

    def finish(self) -> None:
        self._finished = True
        self._queue.put_nowait(StopAsyncIteration())

    @property
    def finished(self) -> bool:
        return self._finished

    def __aiter__(self):
        return self

    async def __anext__(self) -> RequestOutput:
        item = await self._queue.get()
        if isinstance(item, StopAsyncIteration):
            raise StopAsyncIteration
        if isinstance(item, Exception):
            raise item
        return item


class RequestTracker:
    """ref async_llm_engine.py RequestTracker."""

    def __init__(self):
        self._streams: Dict[str, AsyncStream] = {}
        self._new_requests: asyncio.Queue = asyncio.Queue()
        self.new_requests_event: Optional[asyncio.Event] = None

    def init_event(self):
        self.new_requests_event = asyncio.Event()

    def add_request(self, stream_id: str, **engine_add_request_kwargs
                    ) -> AsyncStream:
        stream = AsyncStream(stream_id)
        self._streams[stream_id] = stream
        self._new_requests.put_nowait(
            (stream, engine_add_request_kwargs))
        if self.new_requests_event is not None:
            self.new_requests_event.set()
        return stream

    def get_new_requests(self) -> List[dict]:
        out = []
        while not self._new_requests.empty():
            stream, kwargs = self._new_requests.get_nowait()
            out.append(kwargs)
        return out

    def process_request_output(self, output: RequestOutput) -> None:
        stream = self._streams.get(output.seq_id)
        if stream is None:
            return
        stream.put(output)
        if output.finished:
            stream.finish()
            del self._streams[output.seq_id]

    def abort_request(self, seq_id: str) -> None:
        stream = self._streams.pop(seq_id, None)
        if stream is not None:
            stream.finish()


class AsyncLLMEngine:
    """ref async_llm_engine.py:60-290."""

    def __init__(self, engine: BaseLLMEngine):
        self.engine = engine
        self.tracker = RequestTracker()
        self.seq_counter = Counter()
        self._background_task: Optional[asyncio.Task] = None

    @classmethod
    def from_engine_args(cls, **kwargs) -> "AsyncLLMEngine":
        from vattention_tpu.engine.llm_engine import LLMEngine

        return cls(LLMEngine.from_engine_args(**kwargs))

    def start_background_loop(self) -> None:
        self.tracker.init_event()
        self._background_task = asyncio.get_event_loop().create_task(
            self.run_engine_loop())

    def _ensure_background_loop(self) -> None:
        """(Re)start the engine loop if it never ran, crashed, or belongs
        to a different (closed) event loop."""
        task = self._background_task
        try:
            stale = (task is None or task.done()
                     or task.get_loop() is not asyncio.get_event_loop())
        except RuntimeError:
            stale = True
        if stale:
            self.start_background_loop()

    async def run_engine_loop(self) -> None:
        """ref :232-290 -- step offloaded to a thread executor so the
        event loop keeps serving HTTP while the TPU step runs."""
        loop = asyncio.get_event_loop()
        while True:
            for kwargs in self.tracker.get_new_requests():
                self.engine.add_request(**kwargs)
            if not self.engine.has_unfinished_requests():
                self.tracker.new_requests_event.clear()
                await self.tracker.new_requests_event.wait()
                continue
            outputs = await loop.run_in_executor(None, self.engine.step)
            for output in outputs:
                self.tracker.process_request_output(output)
            await asyncio.sleep(0)

    async def generate(
        self,
        prompt: Optional[str],
        sampling_params: SamplingParams,
        request_id: Optional[str] = None,
        prompt_token_ids: Optional[List[int]] = None,
    ) -> AsyncIterator[RequestOutput]:
        self._ensure_background_loop()
        seq_id = request_id or str(next(self.seq_counter))
        stream = self.tracker.add_request(
            seq_id,
            prompt=prompt,
            sampling_params=sampling_params,
            prompt_token_ids=prompt_token_ids,
            arrival_time=time.monotonic(),
            seq_id=seq_id,
        )
        async for output in stream:
            yield output

    async def abort(self, request_id: str) -> None:
        self.tracker.abort_request(request_id)

    def get_tokenizer(self):
        return self.engine.tokenizer
