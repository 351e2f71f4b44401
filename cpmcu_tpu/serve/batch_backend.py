"""Continuous-batching chat backend: concurrent requests share the batch.

The reference server serializes requests on one global model
(cpmcu/server.py:34); this backend multiplexes them through
``engine.batch_engine.ContinuousBatchingEngine`` instead — a pump thread
advances the scheduler and fans StepEvents out to per-request queues, so N
concurrent HTTP requests decode together in lockstep (BASELINE config 5's
continuous batching, in the serving path).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

from .logging import logger
from .openai_api import (
    ChatCompletionRequest,
    chat_completion_chunk,
    chat_completion_response,
    completion_id,
)
from .server import ChatBackend, StopMatcher, _sse


class BatchChatBackend(ChatBackend):
    """ChatBackend over a ContinuousBatchingEngine.

    Sampling is per-request: the OpenAI ``temperature``/``top_p`` fields map
    to per-slot sampling vectors (ops.sampling.sample_per_row), so requests
    with different temperatures batch together correctly.
    """

    def __init__(self, engine, tokenizer, model_name: str = "cpmcu-tpu",
                 default_generation_length: int = 512):
        super().__init__(engine, tokenizer, model_name,
                         default_generation_length)
        self._queues: Dict[int, "queue.Queue"] = {}
        self._pump_lock = threading.Lock()
        self._pump_thread: Optional[threading.Thread] = None

    # -- scheduler pump --------------------------------------------------------

    def _ensure_pump(self):
        with self._pump_lock:
            if self._pump_thread is None or not self._pump_thread.is_alive():
                self._pump_thread = threading.Thread(
                    target=self._pump, daemon=True
                )
                self._pump_thread.start()

    def _pump(self):
        """Drive the scheduler while work exists; exit when idle."""
        while True:
            with self.lock:
                if not self.engine.has_work:
                    self._pump_thread = None
                    return
                events = self.engine.step()
            for ev in events:
                q = self._queues.get(ev.request_id)
                if q is not None:
                    q.put(ev)

    def _submit(self, req: ChatCompletionRequest):
        ids = self._encode(req)
        q: "queue.Queue" = queue.Queue()
        with self.lock:
            rid = self.engine.submit(
                ids, max_new_tokens=req.max_tokens,
                terminators=self._terminators(),
                temperature=req.temperature,
                top_p=req.top_p,
            )
            self._queues[rid] = q
        self._ensure_pump()
        return rid, q, len(ids)

    def _events(self, rid, q):
        while True:
            ev = q.get(timeout=600)
            yield ev
            if ev.finished:
                self._queues.pop(rid, None)
                return

    # -- API --------------------------------------------------------------------

    def _cancel(self, rid):
        """Server-side stop match: free the slot for other requests."""
        with self.lock:
            self.engine.cancel(rid)
        self._queues.pop(rid, None)

    def completion(self, req: ChatCompletionRequest) -> Dict:
        matcher = StopMatcher(req.stop)
        rid, q, n_prompt = self._submit(req)
        toks = []
        text, stopped = "", False
        scanned = 0
        terms = set(self._terminators())
        for ev in self._events(rid, q):
            if ev.token not in terms:
                toks.append(ev.token)
                if matcher:
                    text = self.tokenizer.decode(toks,
                                                 skip_special_tokens=True)
                    cut = matcher.find(text, scanned)
                    scanned = len(text)
                    if cut is not None:
                        text = text[:cut]
                        stopped = True
                        self._cancel(rid)
                        break
        if not matcher:
            text = self.tokenizer.decode(toks, skip_special_tokens=True)
        finish = ("stop" if stopped or len(toks) < req.max_tokens
                  else "length")
        return chat_completion_response(
            completion_id(), self.model_name, text, finish, n_prompt, len(toks)
        )

    def stream(self, req: ChatCompletionRequest) -> Iterator[str]:
        cid = completion_id()
        yield _sse(chat_completion_chunk(
            cid, self.model_name, {"role": "assistant", "content": ""}, None
        ))
        matcher = StopMatcher(req.stop)
        rid, q, _ = self._submit(req)
        terms = set(self._terminators())
        buf, emitted, text = [], "", ""
        n = 0
        scanned = 0
        stopped = False
        for ev in self._events(rid, q):
            n += 1
            if ev.token not in terms:
                buf.append(ev.token)
                text = self.tokenizer.decode(buf, skip_special_tokens=True)
                if not text.endswith("�"):
                    cut = matcher.find(text, scanned)
                    scanned = len(text)
                    if cut is not None:
                        text = text[:cut]
                        stopped = True
                    safe = text if stopped else text[: matcher.safe_len(text)]
                    if len(safe) > len(emitted):
                        yield _sse(chat_completion_chunk(
                            cid, self.model_name,
                            {"content": safe[len(emitted):]}, None,
                        ))
                        emitted = safe
                    if stopped:
                        self._cancel(rid)
                        break
        if not stopped and len(text) > len(emitted) and not text.endswith("�"):
            yield _sse(chat_completion_chunk(
                cid, self.model_name, {"content": text[len(emitted):]}, None,
            ))
        finish = "stop" if stopped or n < req.max_tokens else "length"
        yield _sse(chat_completion_chunk(cid, self.model_name, {}, finish))
        yield "data: [DONE]\n\n"
