"""Scripted fake LSP server for tests/test_lsp.py.

Speaks the LSP base protocol over stdio: Content-Length framing,
initialize handshake, hierarchical textDocument/documentSymbol with
canned symbols derived from the opened text, and
textDocument/references. Run: python tests/fake_lsp_server.py
"""

import json
import re
import sys


def read_msg(stdin):
    headers = {}
    line = stdin.readline()
    if not line:
        return None
    while line and line.strip():
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        line = stdin.readline()
    length = int(headers.get(b"content-length", b"0"))
    if length <= 0:
        return None
    return json.loads(stdin.read(length))


def write_msg(stdout, msg):
    data = json.dumps(msg).encode()
    stdout.write(b"Content-Length: %d\r\n\r\n%s" % (len(data), data))
    stdout.flush()


def symbols_for(text):
    """Canned hierarchy: classes (kind 5) containing defs (kind 6)."""
    out = []
    current_class = None
    for i, line in enumerate(text.splitlines()):
        m = re.match(r"class (\w+)", line)
        if m:
            current_class = {
                "name": m.group(1), "kind": 5,
                "range": {"start": {"line": i, "character": 0},
                          "end": {"line": i + 50, "character": 0}},
                "selectionRange": {"start": {"line": i, "character": 6},
                                   "end": {"line": i, "character": 6}},
                "detail": "fake class",
                "children": [],
            }
            out.append(current_class)
            continue
        m = re.match(r"(\s*)def (\w+)", line)
        if m:
            sym = {
                "name": m.group(2), "kind": 6 if m.group(1) else 12,
                "range": {"start": {"line": i, "character": 0},
                          "end": {"line": i + 5, "character": 0}},
                "selectionRange": {"start": {"line": i, "character": 4},
                                   "end": {"line": i, "character": 4}},
                "detail": "fake fn",
                "children": [],
            }
            if m.group(1) and current_class is not None:
                current_class["children"].append(sym)
            else:
                current_class = None
                out.append(sym)
    return out


def main():
    stdin = sys.stdin.buffer
    stdout = sys.stdout.buffer
    docs = {}
    while True:
        msg = read_msg(stdin)
        if msg is None:
            return
        method = msg.get("method", "")
        mid = msg.get("id")
        if method == "initialize":
            write_msg(stdout, {"jsonrpc": "2.0", "id": mid, "result": {
                "capabilities": {"documentSymbolProvider": True},
                "serverInfo": {"name": "fake-lsp", "version": "1.0"},
            }})
        elif method == "textDocument/didOpen":
            td = msg["params"]["textDocument"]
            docs[td["uri"]] = td["text"]
        elif method == "textDocument/documentSymbol":
            uri = msg["params"]["textDocument"]["uri"]
            write_msg(stdout, {"jsonrpc": "2.0", "id": mid,
                               "result": symbols_for(docs.get(uri, ""))})
        elif method == "textDocument/references":
            write_msg(stdout, {"jsonrpc": "2.0", "id": mid, "result": [
                {"uri": msg["params"]["textDocument"]["uri"],
                 "range": {"start": {"line": 0, "character": 0},
                           "end": {"line": 0, "character": 1}}},
            ]})
        elif method == "shutdown":
            write_msg(stdout, {"jsonrpc": "2.0", "id": mid, "result": None})
        elif method == "exit":
            return
        elif mid is not None:
            write_msg(stdout, {"jsonrpc": "2.0", "id": mid, "result": None})


if __name__ == "__main__":
    main()
