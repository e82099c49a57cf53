"""Minimal OpenAI-client example against the bundled server (the analogue
of the reference's tests/test_oai_completions.py, with actual assertions).

Start the server first:
  python -m moe_infinity_tpu.entrypoints.openai.server --model <ckpt> --port 8000
"""

import json
import urllib.request

BASE = "http://127.0.0.1:8000"


def post(path, payload):
    req = urllib.request.Request(
        BASE + path, json.dumps(payload).encode(),
        {"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


resp = post(
    "/v1/completions",
    {"prompt": "Suggest three names for a pet cow.", "max_tokens": 48,
     "temperature": 0.0},
)
assert resp["object"] == "text_completion"
print(resp["choices"][0]["text"])

resp = post(
    "/v1/chat/completions",
    {"messages": [{"role": "user", "content": "What is a mixture of experts?"}],
     "max_tokens": 64, "temperature": 0.0},
)
assert resp["choices"][0]["message"]["role"] == "assistant"
print(resp["choices"][0]["message"]["content"])

with urllib.request.urlopen(BASE + "/metrics", timeout=30) as r:
    print("metrics:", json.loads(r.read()))
