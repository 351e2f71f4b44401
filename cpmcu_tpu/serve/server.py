"""OpenAI-compatible API server: ``python -m cpmcu_tpu.server``.

Parity with the reference FastAPI server (cpmcu/server.py:38-492):
``/v1/chat/completions`` (stream SSE + non-stream), ``/v1/models``,
``/health`` with memory stats, chat-template formatting, per-request
temperature override, one global engine with serialized requests.

Runs on FastAPI+uvicorn when installed; otherwise on a stdlib
ThreadingHTTPServer backend with identical routes (this image ships no
fastapi, and the serving logic is small enough that the fallback is the
complete implementation rather than a stub).
"""

from __future__ import annotations

import json
import threading
from typing import Dict, Iterator, Optional

from .logging import logger
from .openai_api import (
    ChatCompletionRequest,
    chat_completion_chunk,
    chat_completion_response,
    completion_id,
)


class StopMatcher:
    """OpenAI ``stop`` sequences, matched on decoded TEXT: generation halts
    at the first occurrence of any stop string, which is excluded from the
    output (the reference stops on any single token of the encoded stop
    strings, cpmcu/server.py:134-152 — text matching is the exact
    semantics)."""

    def __init__(self, stops):
        self.stops = [s for s in (stops or []) if s]
        self._hold = max((len(s) for s in self.stops), default=1) - 1

    def __bool__(self):
        return bool(self.stops)

    def find(self, text: str, scan_from: int = 0) -> Optional[int]:
        """Index of the earliest stop-string match, or None. ``scan_from``
        = length of the previously scanned prefix, so incremental callers
        only rescan the tail a new match could start in (keeps per-token
        matching O(new chars), not O(total))."""
        cuts = [
            i for i in (
                text.find(s, max(0, scan_from - len(s) + 1))
                for s in self.stops
            ) if i != -1
        ]
        return min(cuts) if cuts else None

    def safe_len(self, text: str) -> int:
        """Longest prefix safe to stream now (a later chunk could complete
        a stop string that started inside the held-back tail)."""
        if not self.stops:
            return len(text)
        return max(0, len(text) - self._hold)


class ChatBackend:
    """Engine + tokenizer behind a lock (requests serialize, server.py:34)."""

    def __init__(self, engine, tokenizer, model_name: str = "cpmcu-tpu",
                 default_generation_length: int = 512):
        self.engine = engine
        self.tokenizer = tokenizer
        self.model_name = model_name
        self.default_generation_length = default_generation_length
        self.lock = threading.Lock()

    # -- request handling ----------------------------------------------------

    def _encode(self, req: ChatCompletionRequest):
        msgs = [{"role": m.role, "content": m.content} for m in req.messages]
        if getattr(self.tokenizer, "chat_template", None):
            return self.tokenizer.apply_chat_template(
                msgs, add_generation_prompt=True, tokenize=True
            )
        text = "\n".join(f"{m['role']}: {m['content']}" for m in msgs)
        return self.tokenizer.encode(text + "\nassistant:")

    def _with_temperature(self, req: ChatCompletionRequest):
        """Per-request sampling override (server.py:235-236)."""
        import dataclasses

        eng = self.engine.eng
        changed = {}
        if req.temperature is not None:
            changed["temperature"] = float(req.temperature)
        if req.top_p is not None:
            changed["top_p"] = float(req.top_p)
        if changed:
            self.engine.eng = dataclasses.replace(eng, **changed)
        return eng

    def completion(self, req: ChatCompletionRequest) -> Dict:
        matcher = StopMatcher(req.stop)
        with self.lock:
            prev = self._with_temperature(req)
            try:
                ids = self._encode(req)
                self.engine.reset()
                terminators = self._terminators()
                if not matcher:
                    tokens, _, _ = self.engine.generate(
                        ids, generation_length=req.max_tokens,
                        terminators=terminators,
                    )
                    text = self.tokenizer.decode(tokens,
                                                 skip_special_tokens=True)
                    finish = ("stop" if len(tokens) < req.max_tokens
                              else "length")
                else:
                    # consume the stream so a stop match halts decoding
                    tokens, text, finish = [], "", None
                    scanned = 0
                    terms = set(terminators)
                    for item in self.engine.generate(
                        ids, generation_length=req.max_tokens,
                        terminators=terminators, use_stream=True,
                    ):
                        if item["token"] not in terms:
                            tokens.append(item["token"])
                            text = self.tokenizer.decode(
                                tokens, skip_special_tokens=True)
                            cut = matcher.find(text, scanned)
                            scanned = len(text)
                            if cut is not None:
                                text = text[:cut]
                                finish = "stop"
                                break
                        if item["is_finished"]:
                            break
                    if finish is None:
                        finish = ("stop" if len(tokens) < req.max_tokens
                                  else "length")
            finally:
                self.engine.eng = prev
        return chat_completion_response(
            completion_id(), self.model_name, text, finish, len(ids), len(tokens)
        )

    def stream(self, req: ChatCompletionRequest) -> Iterator[str]:
        """SSE event stream (server.py:334-432)."""
        cid = completion_id()
        yield _sse(chat_completion_chunk(
            cid, self.model_name, {"role": "assistant", "content": ""}, None
        ))
        matcher = StopMatcher(req.stop)
        stopped = False
        with self.lock:
            prev = self._with_temperature(req)
            try:
                ids = self._encode(req)
                self.engine.reset()
                terminators = self._terminators()
                emitted = ""
                text = ""
                buf = []
                n = 0
                scanned = 0
                for item in self.engine.generate(
                    ids, generation_length=req.max_tokens,
                    terminators=terminators, use_stream=True,
                ):
                    n += 1
                    if item["token"] not in terminators:
                        buf.append(item["token"])
                        text = self.tokenizer.decode(buf, skip_special_tokens=True)
                        if not text.endswith("�"):
                            cut = matcher.find(text, scanned)
                            scanned = len(text)
                            if cut is not None:
                                text = text[:cut]
                                stopped = True
                            # hold back a tail that could start a stop match
                            safe = text if stopped else \
                                text[: matcher.safe_len(text)]
                            if len(safe) > len(emitted):
                                yield _sse(chat_completion_chunk(
                                    cid, self.model_name,
                                    {"content": safe[len(emitted):]}, None,
                                ))
                                emitted = safe
                            if stopped:
                                break
                    if item["is_finished"]:
                        break
                if not stopped and len(text) > len(emitted) \
                        and not text.endswith("�"):
                    # flush the held-back tail
                    yield _sse(chat_completion_chunk(
                        cid, self.model_name,
                        {"content": text[len(emitted):]}, None,
                    ))
            finally:
                self.engine.eng = prev
        finish = "stop" if stopped or n < req.max_tokens else "length"
        yield _sse(chat_completion_chunk(cid, self.model_name, {}, finish))
        yield "data: [DONE]\n\n"

    def _terminators(self):
        eos = getattr(self.tokenizer, "eos_token_id", None)
        return [eos] if eos is not None else []

    def health(self) -> Dict:
        import jax

        info = {"status": "healthy", "model": self.model_name,
                "max_total_length": getattr(self.engine, "max_total_length", 0)}
        try:
            stats = jax.devices()[0].memory_stats() or {}
            info["memory"] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
        except Exception:
            pass
        return info

    def models(self) -> Dict:
        return {
            "object": "list",
            "data": [{"id": self.model_name, "object": "model",
                      "owned_by": "cpmcu-tpu"}],
        }


def _sse(obj: Dict) -> str:
    return f"data: {json.dumps(obj, ensure_ascii=False)}\n\n"


# ---------------------------------------------------------------------------
# stdlib HTTP backend
# ---------------------------------------------------------------------------


def make_stdlib_server(backend: ChatBackend, host: str, port: int):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route through our logger
            logger.debug(fmt % args)

        def _json(self, code: int, obj: Dict):
            body = json.dumps(obj, ensure_ascii=False).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, backend.health())
            elif self.path == "/v1/models":
                self._json(200, backend.models())
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/v1/chat/completions":
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = ChatCompletionRequest.from_dict(
                    json.loads(self.rfile.read(length))
                )
            except (ValueError, json.JSONDecodeError) as e:
                self._json(400, {"error": {"message": str(e), "type":
                                           "invalid_request_error"}})
                return
            try:
                if req.stream:
                    self.send_response(200)
                    self.send_header("Content-Type", "text/event-stream")
                    self.send_header("Cache-Control", "no-cache")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    for event in backend.stream(req):
                        data = event.encode()
                        self.wfile.write(f"{len(data):x}\r\n".encode())
                        self.wfile.write(data + b"\r\n")
                        self.wfile.flush()
                    self.wfile.write(b"0\r\n\r\n")
                else:
                    self._json(200, backend.completion(req))
            except BrokenPipeError:
                logger.warning("client disconnected mid-stream")
            except Exception as e:  # surface as OpenAI-style error
                logger.error(f"request failed: {e}")
                try:
                    self._json(500, {"error": {"message": str(e),
                                               "type": "server_error"}})
                except Exception:
                    pass

    return ThreadingHTTPServer((host, port), Handler)


# ---------------------------------------------------------------------------
# FastAPI backend (preferred when installed)
# ---------------------------------------------------------------------------


def make_fastapi_app(backend: ChatBackend):
    from fastapi import FastAPI, Request
    from fastapi.responses import JSONResponse, StreamingResponse

    app = FastAPI(title="cpmcu_tpu")

    @app.get("/health")
    def health():
        return backend.health()

    @app.get("/v1/models")
    def models():
        return backend.models()

    @app.post("/v1/chat/completions")
    async def chat(request: Request):
        try:
            req = ChatCompletionRequest.from_dict(await request.json())
        except ValueError as e:
            return JSONResponse(
                {"error": {"message": str(e), "type": "invalid_request_error"}},
                status_code=400,
            )
        if req.stream:
            return StreamingResponse(
                backend.stream(req), media_type="text/event-stream"
            )
        return backend.completion(req)

    return app


def serve(backend: ChatBackend, host: str = "0.0.0.0", port: int = 8000):
    try:
        import uvicorn

        app = make_fastapi_app(backend)
        logger.info(f"serving (fastapi) on {host}:{port}")
        logger.capture_external("uvicorn", "uvicorn.error", "uvicorn.access")
        uvicorn.run(app, host=host, port=port, log_level="info")
    except ImportError:
        httpd = make_stdlib_server(backend, host, port)
        logger.info(f"serving (stdlib http) on {host}:{port}")
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            httpd.shutdown()


def main(argv=None) -> int:
    from .args import make_server_parser
    from .factory import create_engine

    args = vars(make_server_parser().parse_args(argv))
    # the factory dispatches: single-sequence, continuous batching, and
    # batched EAGLE-2 speculation (max_batch + draft model)
    engine, tokenizer = create_engine(args)
    if tokenizer is None:
        logger.error("server requires a tokenizer")
        return 2
    if args.get("max_batch"):
        from .batch_backend import BatchChatBackend

        backend = BatchChatBackend(engine, tokenizer,
                                   model_name=args["model_path"])
    else:
        backend = ChatBackend(engine, tokenizer, model_name=args["model_path"])
    serve(backend, args["host"], args["port"])
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
