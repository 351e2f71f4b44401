"""OpenAI-compatible request/response schemas.

Parity with cpmcu/common/openai_api.py (pydantic models for
/v1/chat/completions). Kept dependency-light: plain dataclasses with
dict (de)serialization so the stdlib server fallback works without
pydantic; ``validate_chat_request`` performs the field checks pydantic
would.
"""

from __future__ import annotations

import dataclasses
import time
import uuid
from typing import Any, Dict, List, Optional


@dataclasses.dataclass
class ChatMessage:
    role: str
    content: str


@dataclasses.dataclass
class ChatCompletionRequest:
    model: str
    messages: List[ChatMessage]
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    max_tokens: int = 512
    stream: bool = False
    stop: Optional[List[str]] = None

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "ChatCompletionRequest":
        msgs = d.get("messages")
        if not isinstance(msgs, list) or not msgs:
            raise ValueError("messages must be a non-empty list")
        messages = []
        for m in msgs:
            if not isinstance(m, dict) or "role" not in m or "content" not in m:
                raise ValueError("each message needs role and content")
            if m["role"] not in ("system", "user", "assistant", "tool"):
                raise ValueError(f"invalid role {m['role']!r}")
            messages.append(ChatMessage(m["role"], str(m["content"])))
        stop = d.get("stop")
        if stop is not None:
            if isinstance(stop, str):
                stop = [stop]
            if (not isinstance(stop, list)
                    or not all(isinstance(s, str) for s in stop)):
                raise ValueError("stop must be a string or list of strings")
            stop = [s for s in stop if s]
            if len(stop) > 4:  # OpenAI rejects >4 rather than truncating
                raise ValueError("stop accepts at most 4 sequences")
        return ChatCompletionRequest(
            model=str(d.get("model", "cpmcu-tpu")),
            messages=messages,
            temperature=d.get("temperature"),
            top_p=d.get("top_p"),
            max_tokens=int(d.get("max_tokens") or d.get("max_completion_tokens") or 512),
            stream=bool(d.get("stream", False)),
            stop=stop or None,
        )


def completion_id() -> str:
    return f"chatcmpl-{uuid.uuid4().hex[:24]}"


def chat_completion_response(
    cid: str, model: str, text: str, finish_reason: str,
    prompt_tokens: int, completion_tokens: int,
) -> Dict[str, Any]:
    return {
        "id": cid,
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


def chat_completion_chunk(
    cid: str, model: str, delta: Dict[str, Any], finish_reason: Optional[str]
) -> Dict[str, Any]:
    return {
        "id": cid,
        "object": "chat.completion.chunk",
        "created": int(time.time()),
        "model": model,
        "choices": [{
            "index": 0,
            "delta": delta,
            "finish_reason": finish_reason,
        }],
    }
