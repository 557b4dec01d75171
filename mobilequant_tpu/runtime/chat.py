"""Chat prompt templates (analogue of the reference's hardcoded tokenized
templates, capp/src/llm.cpp:382-392, done at the string level so any tokenizer
works)."""

from __future__ import annotations

CHAT_TEMPLATES = {
    # TinyLlama-1.1B-Chat (zephyr format)
    "llama": ("<|system|>\nYou are a friendly chatbot.</s>\n"
              "<|user|>\n{prompt}</s>\n<|assistant|>\n"),
    # Gemma instruction format
    "gemma": ("<start_of_turn>user\n{prompt}<end_of_turn>\n"
              "<start_of_turn>model\n"),
    # StableLM-2 zephyr format
    "stablelm": ("<|user|>\n{prompt}<|endoftext|>\n<|assistant|>\n"),
    "none": "{prompt}",
}


def apply_chat_template(prompt: str, family: str = "none") -> str:
    tpl = CHAT_TEMPLATES.get(family)
    if tpl is None:
        raise KeyError(f"unknown chat family {family!r}; known: {sorted(CHAT_TEMPLATES)}")
    return tpl.format(prompt=prompt)
