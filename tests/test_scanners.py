"""Per-language scanner fixtures (parser/scanners.py + parser/lexer.py).

Round-1 VERDICT item 3 exit criteria: for each of the 12 non-Python
languages assert (a) methods CONTAINS-link to their class, (b)
EXTENDS/IMPLEMENTS heritage edges, (c) zero declarations or calls
matched inside string literals / comments.
"""

import pytest

from codegraph_tpu.core.types import EdgeType, Language, NodeType
from codegraph_tpu.parser.extractors import extract_file


def names(r, ntype=None):
    return {n.name for n in r.nodes
            if ntype is None or n.node_type == ntype}


def by_name(r):
    # first occurrence wins: the class decl precedes its constructor,
    # which legitimately shares the class name
    out = {}
    for n in r.nodes:
        out.setdefault(n.name, n)
    return out


def contains_pairs(r):
    b = by_name(r)
    ids = {n.id: n.name for n in r.nodes}
    return {(ids.get(e.src, e.src), ids.get(e.dst, e.dst))
            for e in r.edges if e.edge_type == EdgeType.CONTAINS}


def heritage(r, etype):
    ids = {n.id: n.name for n in r.nodes}
    return {(ids.get(e.src, e.src), e.dst)
            for e in r.edges if e.edge_type == etype}


def calls(r):
    ids = {n.id: n.name for n in r.nodes}
    return {(ids.get(e.src, e.src), e.dst)
            for e in r.edges if e.edge_type == EdgeType.CALLS}


# ---------------------------------------------------------------------------
# Rust
# ---------------------------------------------------------------------------

RUST = '''
use std::collections::HashMap;

/* a comment with fn fake_comment_fn() { } inside */
pub struct Engine { map: HashMap<String, u32> }

pub trait Runner: Send {
    fn run(&self);
}

impl Runner for Engine {
    fn run(&self) {
        let msg = "fn fake_string_fn() { not_a_call(); }";
        helper(msg);
    }
}

impl Engine {
    pub fn rebuild(&mut self) -> u32 {
        self.map.clear();
        compute(1)
    }
}

fn helper(s: &str) { println!("{}", s); }
'''


def test_rust_nesting_heritage_strings():
    r = extract_file("p", "engine.rs", RUST, Language.RUST)
    b = by_name(r)
    assert b["Engine"].node_type == NodeType.STRUCT
    assert b["Runner"].node_type == NodeType.TRAIT
    assert b["run"].node_type == NodeType.METHOD
    assert b["rebuild"].node_type == NodeType.METHOD
    assert b["helper"].node_type == NodeType.FUNCTION
    # impl methods CONTAINS-link to the struct node (post-pass)
    cp = contains_pairs(r)
    assert ("Engine", "run") in cp
    assert ("Engine", "rebuild") in cp
    # trait impl: Engine IMPLEMENTS Runner (unresolved dst)
    assert ("Engine", "Runner") in heritage(r, EdgeType.IMPLEMENTS)
    # trait bound: Runner EXTENDS Send
    assert ("Runner", "Send") in heritage(r, EdgeType.EXTENDS)
    # nothing from strings/comments
    assert "fake_comment_fn" not in names(r)
    assert "fake_string_fn" not in names(r)
    assert ("run", "not_a_call") not in calls(r)
    assert ("run", "helper") in calls(r)
    # import captured
    assert any("std" in n for n in names(r, NodeType.IMPORT))


# ---------------------------------------------------------------------------
# TypeScript / JavaScript
# ---------------------------------------------------------------------------

TS = '''
import { Widget } from "./widget";

// class FakeComment { }
interface Shape extends Printable {
  area(): number;
}

export class Circle extends Base implements Shape {
  radius: number = 1;
  area(): number {
    const msg = "class FakeString { } call_in_string()";
    return compute(this.radius);
  }
  static of(r: number): Circle { return new Circle(); }
}

export const makeCircle = (r: number): Circle => {
  return helper(r);
};

type Alias = { a: number };
enum Color { Red, Green }
'''


def test_typescript_nesting_heritage_strings():
    r = extract_file("p", "circle.ts", TS, Language.TYPESCRIPT)
    b = by_name(r)
    assert b["Circle"].node_type == NodeType.CLASS
    assert b["Shape"].node_type == NodeType.INTERFACE
    assert b["area"].node_type == NodeType.METHOD
    assert b["of"].node_type == NodeType.METHOD
    assert b["makeCircle"].node_type == NodeType.FUNCTION
    assert b["Alias"].node_type == NodeType.TYPE_ALIAS
    assert b["Color"].node_type == NodeType.ENUM
    cp = contains_pairs(r)
    assert ("Circle", "area") in cp and ("Circle", "of") in cp
    assert ("Circle", "Base") in heritage(r, EdgeType.EXTENDS)
    assert ("Circle", "Shape") in heritage(r, EdgeType.IMPLEMENTS)
    assert ("Shape", "Printable") in heritage(r, EdgeType.EXTENDS)
    assert "FakeComment" not in names(r)
    assert "FakeString" not in names(r)
    assert ("area", "call_in_string") not in calls(r)
    assert ("area", "compute") in calls(r)
    assert "./widget" in names(r, NodeType.IMPORT)


JS = '''
const fs = require("fs");

class Parser extends Base {
  parse(input) {
    let s = 'function fakeStr() { bad_call(); }';
    return tokenize(input);
  }
}

function main() {
  const p = new Parser();
  p.parse(read());
}

const handler = async (req) => {
  dispatch(req);
};
'''


def test_javascript_nesting_and_arrows():
    r = extract_file("p", "parser.js", JS, Language.JAVASCRIPT)
    b = by_name(r)
    assert b["Parser"].node_type == NodeType.CLASS
    assert b["parse"].node_type == NodeType.METHOD
    assert b["main"].node_type == NodeType.FUNCTION
    assert b["handler"].node_type == NodeType.FUNCTION
    assert ("Parser", "parse") in contains_pairs(r)
    assert ("Parser", "Base") in heritage(r, EdgeType.EXTENDS)
    assert "fakeStr" not in names(r)
    assert ("parse", "bad_call") not in calls(r)
    assert ("parse", "tokenize") in calls(r)
    assert ("handler", "dispatch") in calls(r)
    assert "fs" in names(r, NodeType.IMPORT)


# ---------------------------------------------------------------------------
# Go
# ---------------------------------------------------------------------------

GO = '''
package main

import (
    "fmt"
    "net/http"
)

// func FakeComment() {}
type Server struct { addr string }

type Handler interface { Serve() }

func (s *Server) Serve() {
    msg := "func FakeString() { bad_call() }"
    fmt.Println(render(msg))
}

func NewServer(addr string) *Server {
    return configure(addr)
}
'''


def test_go_receivers_and_strings():
    r = extract_file("p", "server.go", GO, Language.GO)
    b = by_name(r)
    assert b["Server"].node_type == NodeType.STRUCT
    assert b["Handler"].node_type == NodeType.INTERFACE
    assert b["Serve"].node_type == NodeType.METHOD
    assert b["NewServer"].node_type == NodeType.FUNCTION
    assert ("Server", "Serve") in contains_pairs(r)
    assert "FakeComment" not in names(r)
    assert "FakeString" not in names(r)
    assert ("Serve", "bad_call") not in calls(r)
    assert ("Serve", "render") in calls(r)
    assert ("NewServer", "configure") in calls(r)
    assert "fmt" in names(r, NodeType.IMPORT)


# ---------------------------------------------------------------------------
# Java
# ---------------------------------------------------------------------------

JAVA = '''
package app;

import java.util.List;

/** class FakeDoc { } */
public class OrderService extends BaseService implements Auditable, Closeable {
    private List<String> items;

    public OrderService(List<String> items) {
        this.items = validate(items);
    }

    @Override
    public int process(String id) {
        String s = "class FakeString { } bad_call()";
        return dispatch(id);
    }
}

interface Auditable extends Traceable {
    void audit();
}
'''


def test_java_members_heritage_strings():
    r = extract_file("p", "OrderService.java", JAVA, Language.JAVA)
    b = by_name(r)
    assert b["OrderService"].node_type == NodeType.CLASS
    assert b["Auditable"].node_type == NodeType.INTERFACE
    assert b["process"].node_type == NodeType.METHOD
    # constructor is a method named like the class
    cp = contains_pairs(r)
    assert ("OrderService", "process") in cp
    assert ("OrderService", "OrderService") in cp
    assert ("OrderService", "BaseService") in heritage(r, EdgeType.EXTENDS)
    impl = heritage(r, EdgeType.IMPLEMENTS)
    assert ("OrderService", "Auditable") in impl
    assert ("OrderService", "Closeable") in impl
    assert ("Auditable", "Traceable") in heritage(r, EdgeType.EXTENDS)
    assert "FakeDoc" not in names(r)
    assert "FakeString" not in names(r)
    assert ("process", "bad_call") not in calls(r)
    assert ("process", "dispatch") in calls(r)
    assert "java.util.List" in names(r, NodeType.IMPORT)


# ---------------------------------------------------------------------------
# C++
# ---------------------------------------------------------------------------

CPP = '''
#include <vector>
#include "engine.h"

// class FakeComment {};
namespace core {

class Engine : public Base, private Mixin {
 public:
    Engine();
    int run(int x) {
        const char* s = "class FakeString { } bad_call()";
        return helper(x);
    }
 private:
    std::vector<int> data_;
};

int Engine::boot(int flags) {
    return init(flags);
}

int free_fn(int a) { return a + top(a); }

}  // namespace core
'''


def test_cpp_members_heritage_strings():
    r = extract_file("p", "engine.cpp", CPP, Language.CPP)
    b = by_name(r)
    assert b["core"].node_type == NodeType.MODULE
    assert b["Engine"].node_type == NodeType.CLASS
    assert b["run"].node_type == NodeType.METHOD
    assert b["free_fn"].node_type == NodeType.FUNCTION
    assert b["boot"].node_type == NodeType.METHOD  # Foo::bar definition
    cp = contains_pairs(r)
    assert ("Engine", "run") in cp
    assert ("Engine", "boot") in cp  # linked via the :: owner post-pass
    ext = heritage(r, EdgeType.EXTENDS)
    assert ("Engine", "Base") in ext and ("Engine", "Mixin") in ext
    assert "FakeComment" not in names(r)
    assert "FakeString" not in names(r)
    assert ("run", "bad_call") not in calls(r)
    assert ("run", "helper") in calls(r)
    imports = names(r, NodeType.IMPORT)
    assert "vector" in imports and "engine.h" in imports


# ---------------------------------------------------------------------------
# C#
# ---------------------------------------------------------------------------

CSHARP = '''
using System.Collections.Generic;

namespace App.Services;

// class FakeComment { }
public class CartService : BaseService, IAuditable
{
    public CartService() { Init(); }

    public decimal Total(List<int> items)
    {
        var s = "class FakeString { } BadCall()";
        return Sum(items);
    }
}

public interface IAuditable : ITraceable
{
    void Audit();
}
'''


def test_csharp_members_heritage_strings():
    r = extract_file("p", "CartService.cs", CSHARP, Language.CSHARP)
    b = by_name(r)
    assert b["App.Services"].node_type == NodeType.MODULE
    assert b["CartService"].node_type == NodeType.CLASS
    assert b["IAuditable"].node_type == NodeType.INTERFACE
    assert b["Total"].node_type == NodeType.METHOD
    cp = contains_pairs(r)
    assert ("CartService", "Total") in cp
    assert ("CartService", "BaseService") in heritage(r, EdgeType.EXTENDS)
    assert ("CartService", "IAuditable") in heritage(r, EdgeType.IMPLEMENTS)
    assert ("IAuditable", "ITraceable") in heritage(r, EdgeType.EXTENDS)
    assert "FakeComment" not in names(r)
    assert "FakeString" not in names(r)
    assert ("Total", "BadCall") not in calls(r)
    assert ("Total", "Sum") in calls(r)
    assert "System.Collections.Generic" in names(r, NodeType.IMPORT)


# ---------------------------------------------------------------------------
# Ruby
# ---------------------------------------------------------------------------

RUBY = '''
require "json"

# def fake_comment; end
module Billing
  class Invoice < Document
    include Printable

    def total(items)
      s = "def fake_string; bad_call(); end"
      compute(items)
    end

    def self.build(data)
      parse(data)
    end
  end
end

def standalone(x)
  process(x) if x
end
'''


def test_ruby_end_scopes_heritage_strings():
    r = extract_file("p", "invoice.rb", RUBY, Language.RUBY)
    b = by_name(r)
    assert b["Billing"].node_type == NodeType.MODULE
    assert b["Invoice"].node_type == NodeType.CLASS
    assert b["total"].node_type == NodeType.METHOD
    assert b["build"].node_type == NodeType.METHOD
    assert b["standalone"].node_type == NodeType.FUNCTION
    cp = contains_pairs(r)
    assert ("Billing", "Invoice") in cp
    assert ("Invoice", "total") in cp
    assert ("Invoice", "Document") in heritage(r, EdgeType.EXTENDS)
    assert ("Invoice", "Printable") in heritage(r, EdgeType.IMPLEMENTS)
    assert "fake_comment" not in names(r)
    assert "fake_string" not in names(r)
    assert ("total", "bad_call") not in calls(r)
    assert ("total", "compute") in calls(r)
    # modifier-if must not desync the end counting: standalone closed
    assert b["standalone"].location.end_line >= b["standalone"].location.start_line
    assert "json" in names(r, NodeType.IMPORT)


# ---------------------------------------------------------------------------
# PHP
# ---------------------------------------------------------------------------

PHP = '''<?php
namespace App\\Models;

use App\\Lib\\Validator;

// function fake_comment() {}
class Order extends Model implements Arrayable {
    use SoftDeletes;

    public function total($items) {
        $s = "function fake_string() { bad_call(); }";
        return $this->sum(compute($items));
    }
}

function standalone($x) { return helper($x); }
'''


def test_php_members_heritage_strings():
    r = extract_file("p", "Order.php", PHP, Language.PHP)
    b = by_name(r)
    assert b["Order"].node_type == NodeType.CLASS
    assert b["total"].node_type == NodeType.METHOD
    assert b["standalone"].node_type == NodeType.FUNCTION
    assert ("Order", "total") in contains_pairs(r)
    assert ("Order", "Model") in heritage(r, EdgeType.EXTENDS)
    impl = heritage(r, EdgeType.IMPLEMENTS)
    assert ("Order", "Arrayable") in impl
    assert ("Order", "SoftDeletes") in impl  # trait mixin via use
    assert "fake_comment" not in names(r)
    assert "fake_string" not in names(r)
    assert ("total", "bad_call") not in calls(r)
    assert ("total", "compute") in calls(r)
    assert any("Validator" in n for n in names(r, NodeType.IMPORT))


# ---------------------------------------------------------------------------
# Swift
# ---------------------------------------------------------------------------

SWIFT = '''
import Foundation

// class FakeComment {}
class Animal: LivingThing, Describable {
    func speak() -> String {
        let s = "class FakeString { bad_call() }"
        return render(s)
    }
    init() { setUp() }
}

struct Point: Hashable {
    func norm() -> Double { return compute() }
}

extension Animal: Equatable {
    func compare(_ other: Animal) -> Bool { return eq(other) }
}

func topLevel() { helper() }
'''


def test_swift_members_heritage_strings():
    r = extract_file("p", "animal.swift", SWIFT, Language.SWIFT)
    b = by_name(r)
    assert b["Animal"].node_type == NodeType.CLASS
    assert b["Point"].node_type == NodeType.STRUCT
    assert b["speak"].node_type == NodeType.METHOD
    assert b["norm"].node_type == NodeType.METHOD
    assert b["compare"].node_type == NodeType.METHOD
    assert b["topLevel"].node_type == NodeType.FUNCTION
    cp = contains_pairs(r)
    assert ("Animal", "speak") in cp
    assert ("Point", "norm") in cp
    assert ("Animal", "compare") in cp  # extension methods -> type
    # first heritage entry = superclass, rest = protocols
    assert ("Animal", "LivingThing") in heritage(r, EdgeType.EXTENDS)
    impl = heritage(r, EdgeType.IMPLEMENTS)
    assert ("Animal", "Describable") in impl
    assert ("Point", "Hashable") in impl
    assert ("Animal", "Equatable") in impl  # extension conformance
    assert "FakeComment" not in names(r)
    assert "FakeString" not in names(r)
    assert ("speak", "bad_call") not in calls(r)
    assert ("speak", "render") in calls(r)
    assert "Foundation" in names(r, NodeType.IMPORT)


# ---------------------------------------------------------------------------
# Kotlin
# ---------------------------------------------------------------------------

KOTLIN = '''
import kotlin.collections.List

// class FakeComment
class Repo(private val db: Db) : BaseRepo(), Flushable {
    fun save(item: Item): Boolean {
        val s = "class FakeString { bad_call() }"
        return persist(item)
    }
}

interface Flushable {
    fun flush()
}

data class Item(val id: Int)

fun String.slugify(): String = normalize(this)

fun topLevel(x: Int): Int { return helper(x) }
'''


def test_kotlin_members_heritage_strings():
    r = extract_file("p", "repo.kt", KOTLIN, Language.KOTLIN)
    b = by_name(r)
    assert b["Repo"].node_type == NodeType.CLASS
    assert b["Flushable"].node_type == NodeType.INTERFACE
    assert b["Item"].node_type == NodeType.CLASS
    assert b["save"].node_type == NodeType.METHOD
    assert b["topLevel"].node_type == NodeType.FUNCTION
    assert b["slugify"].node_type == NodeType.METHOD  # extension receiver
    assert ("Repo", "save") in contains_pairs(r)
    # () marks the superclass constructor call; bare name = interface
    assert ("Repo", "BaseRepo") in heritage(r, EdgeType.EXTENDS)
    assert ("Repo", "Flushable") in heritage(r, EdgeType.IMPLEMENTS)
    assert "FakeComment" not in names(r)
    assert "FakeString" not in names(r)
    assert ("save", "bad_call") not in calls(r)
    assert ("save", "persist") in calls(r)
    assert any("List" in n for n in names(r, NodeType.IMPORT))


# ---------------------------------------------------------------------------
# Dart
# ---------------------------------------------------------------------------

DART = '''
import 'package:flutter/material.dart';

// class FakeComment {}
class Cart extends ChangeNotifier with Logging implements Store {
  final List<int> items = [];

  int total(int tax) {
    var s = "class FakeString { bad_call() }";
    return compute(tax);
  }

  Cart() { init(); }
}

enum Status { open, closed }

int topLevel(int x) { return helper(x); }
'''


def test_dart_members_heritage_strings():
    r = extract_file("p", "cart.dart", DART, Language.DART)
    b = by_name(r)
    assert b["Cart"].node_type == NodeType.CLASS
    assert b["Status"].node_type == NodeType.ENUM
    assert b["total"].node_type == NodeType.METHOD
    assert b["topLevel"].node_type == NodeType.FUNCTION
    cp = contains_pairs(r)
    assert ("Cart", "total") in cp
    assert ("Cart", "Cart") in cp  # constructor
    assert ("Cart", "ChangeNotifier") in heritage(r, EdgeType.EXTENDS)
    impl = heritage(r, EdgeType.IMPLEMENTS)
    assert ("Cart", "Logging") in impl  # mixin via with
    assert ("Cart", "Store") in impl
    assert "FakeComment" not in names(r)
    assert "FakeString" not in names(r)
    assert ("total", "bad_call") not in calls(r)
    assert ("total", "compute") in calls(r)
    assert "package:flutter/material.dart" in names(r, NodeType.IMPORT)


# ---------------------------------------------------------------------------
# Cross-language: spans, nesting depth, no decls in multiline strings
# ---------------------------------------------------------------------------

def test_spans_cover_bodies():
    r = extract_file("p", "engine.rs", RUST, Language.RUST)
    for nm, multiline in (("run", True), ("rebuild", True),
                          ("helper", False)):
        # "run" exists twice (trait signature + impl body): the impl
        # definition must span its body; "helper" is a one-liner
        n = max((x for x in r.nodes if x.name == nm),
                key=lambda x: x.location.end_line - x.location.start_line)
        if multiline:
            assert n.location.end_line > n.location.start_line, nm
        assert "{" in n.content, nm


def test_nested_namespaces_two_deep():
    src = '''
namespace outer {
namespace inner {
class Deep {
 public:
    int leaf() { return f(); }
};
}
}
'''
    r = extract_file("p", "d.cpp", src, Language.CPP)
    cp = contains_pairs(r)
    assert ("outer", "inner") in cp
    assert ("inner", "Deep") in cp
    assert ("Deep", "leaf") in cp


def test_multiline_string_no_false_positives():
    src = '''
const tpl = `
class FakeTemplate {
  fakeMethod() { fake_call(); }
}
`;
function real() { actual(); }
'''
    r = extract_file("p", "t.js", src, Language.JAVASCRIPT)
    assert "FakeTemplate" not in names(r)
    assert "fakeMethod" not in names(r)
    assert ("real", "actual") in calls(r)


def test_rust_raw_string_and_lifetime():
    src = '''
fn with_raw<'a>(s: &'a str) -> &'a str {
    let q = r#"fn fake_raw() { bad(); }"#;
    trim(q)
}
'''
    r = extract_file("p", "r.rs", src, Language.RUST)
    assert "fake_raw" not in names(r)
    assert "with_raw" in names(r, NodeType.FUNCTION)
    assert ("with_raw", "trim") in calls(r)


def test_ruby_while_do_single_scope():
    """`while x do` must count as ONE scope (round-2 regression: the
    opener keyword and the trailing `do` each pushed, desyncing every
    later `end` in the file)."""
    src = (
        "class C\n"
        "  def m\n"
        "    while x do\n"
        "      y\n"
        "    end\n"
        "  end\n"
        "end\n"
        "def top\n"
        "  1\n"
        "end\n"
    )
    r = extract_file("p", "a.rb", src, Language.RUBY)
    assert ("C", NodeType.CLASS) in {(n.name, n.node_type) for n in r.nodes}
    c = next(n for n in r.nodes if n.name == "C")
    assert c.location.end_line == 7  # closed by its own end, not EOF
    top = next(n for n in r.nodes if n.name == "top")
    # top is NOT a method of C
    assert ("C", "top") not in contains_pairs(r)


def test_ruby_setter_operator_defs_and_expression_if():
    """Setter (def name=), operator (def ==), and expression-if forms
    must not desync end-counting (pass-5 review regressions)."""
    src = (
        "class C\n"
        "  def name=(value)\n"
        "    @name = value\n"
        "  end\n"
        "  def ==(other)\n"
        "    @name == other.name\n"
        "  end\n"
        "  def m\n"
        "    mode = if production?\n"
        "      :fast\n"
        "    else\n"
        "      :slow\n"
        "    end\n"
        "    mode\n"
        "  end\n"
        "end\n"
        "def top\n"
        "  1\n"
        "end\n"
    )
    r = extract_file("p", "a.rb", src, Language.RUBY)
    c = next(n for n in r.nodes if n.name == "C")
    assert c.location.end_line == 16
    pairs = contains_pairs(r)
    assert ("C", "name=") in pairs and ("C", "==") in pairs
    assert ("C", "m") in pairs and ("C", "top") not in pairs


def test_ruby_heredoc_body_is_string():
    """Keywords inside heredoc text must not desync the end-counter."""
    src = (
        "class C\n"
        "  def m\n"
        "    sql = <<~SQL\n"
        "      select 1\n"
        "      end of the offer\n"
        "      def not_a_def\n"
        "    SQL\n"
        "    sql\n"
        "  end\n"
        "  def p\n"
        "    2\n"
        "  end\n"
        "end\n"
    )
    r = extract_file("p", "h.rb", src, Language.RUBY)
    names = {n.name for n in r.nodes}
    assert "not_a_def" not in names
    assert ("C", "p") in contains_pairs(r)
    c = next(n for n in r.nodes if n.name == "C")
    assert c.location.end_line == 13


def test_php_closure_use_not_an_import():
    src = (
        "<?php\n"
        "function outer($a) {\n"
        "    $x = 1;\n"
        "    $f = function ($b) use ($x) {\n"
        "        return $b + $x;\n"
        "    };\n"
        "    return $f($a);\n"
        "}\n"
        "function later() { return 2; }\n"
    )
    r = extract_file("p", "c.php", src, Language.PHP)
    outer = next(n for n in r.nodes if n.name == "outer")
    assert outer.location.end_line == 8
    assert not [n for n in r.nodes
                if n.node_type == NodeType.IMPORT and "$" in n.name]
    assert any(n.name == "later" for n in r.nodes)


def test_cpp_template_class_param_not_a_class():
    src = (
        "template <class T>\n"
        "class Foo : public Base {\n"
        " public:\n"
        "  void run();\n"
        "};\n"
        "template <typename A, class B>\n"
        "struct Pair {};\n"
    )
    r = extract_file("p", "t.cpp", src, Language.CPP)
    names = {n.name for n in r.nodes if n.node_type in
             (NodeType.CLASS, NodeType.STRUCT)}
    assert names == {"Foo", "Pair"}
    assert ("Foo", "Base") in heritage(r, EdgeType.EXTENDS)


def test_go_generic_receiver_owner():
    src = (
        "type Server struct{}\n"
        "func (s *Server[T]) Run() {}\n"
    )
    r = extract_file("p", "s.go", src, Language.GO)
    assert ("Server", "Run") in contains_pairs(r)


def test_ts_nonnull_assertion_not_a_call():
    src = (
        "function f(maybe?: Thing) {\n"
        "  const v = maybe!.value;\n"
        "  return v;\n"
        "}\n"
    )
    r = extract_file("p", "x.ts", src, Language.TYPESCRIPT)
    assert not [d for _, d in calls(r) if d == "maybe"]


def test_rust_macro_call_still_detected():
    src = 'fn main() { println!("hi"); }\n'
    r = extract_file("p", "m.rs", src, Language.RUST)
    assert [d for _, d in calls(r) if d == "println"]


# ---------------------------------------------------------------------------
# Round-5 parity-harness regressions (benchmarks/scanner_parity_r5.py)
# ---------------------------------------------------------------------------


def test_multiline_block_comment_fully_dropped():
    """Under re.M the lexer's `$` closed /* */ at the FIRST newline,
    leaking license-header text as tokens (`function DAMAGES` nodes on
    /usr/include headers). \\Z fixed it — for every non-nested-comment
    language."""
    src = (
        "/*\n"
        " * CONSEQUENTIAL DAMAGES (INCLUDING fake_call());\n"
        " * struct phantom { };\n"
        " */\n"
        "struct real_one { int x; };\n"
    )
    r = extract_file("p", "h.h", src, Language.CPP)
    assert names(r, NodeType.STRUCT) == {"real_one"}
    src_js = "/*\n class Fake {\n}\n*/\nclass Real {}\n"
    rj = extract_file("p", "c.js", src_js, Language.JAVASCRIPT)
    assert names(rj, NodeType.CLASS) == {"Real"}


def test_rust_scoped_use_extracted():
    """rust.rs:153 extracts every use_declaration; mod-body and
    fn-local uses count (20% of the reference crates' imports)."""
    src = (
        "mod tests {\n"
        "    use super::helper;\n"
        "    fn t() { use std::mem::swap; }\n"
        "}\n"
    )
    r = extract_file("p", "l.rs", src, Language.RUST)
    imports = names(r, NodeType.IMPORT)
    assert "super::helper" in imports
    assert "std::mem::swap" in imports


def test_go_java_package_module_nodes():
    rg = extract_file("p", "g.go", "package geometry\n\nfunc F() {}\n",
                      Language.GO)
    assert "geometry" in names(rg, NodeType.MODULE)
    rj = extract_file("p", "J.java",
                      "package com.example.geo;\n\nclass P {}\n",
                      Language.JAVA)
    assert "com.example.geo" in names(rj, NodeType.MODULE)


def test_csharp_block_namespace_dotted_name():
    src = "namespace Example.Geo\n{\n    class P { }\n}\n"
    r = extract_file("p", "n.cs", src, Language.CSHARP)
    assert "Example.Geo" in names(r, NodeType.MODULE)


def test_php_use_alias_not_in_path():
    src = "<?php\nuse Example\\Util\\Math as M;\n"
    r = extract_file("p", "u.php", src, Language.PHP)
    imports = names(r, NodeType.IMPORT)
    assert "Example\\Util\\Math" in imports
    assert not [i for i in imports if "as" in i.split("\\")]


def test_cpp_include_trailing_comment_and_macro_class():
    src = (
        "#include <type_traits>    // for std::decay\n"
        "class IMF_EXPORT_TYPE Name : public Base {\n"
        "public:\n"
        "    void m();\n"
        "};\n"
        "void take(struct opaque *p) { }\n"
        "struct conv map = { .table = { 1 } };\n"
    )
    r = extract_file("p", "i.h", src, Language.CPP)
    assert "type_traits" in names(r, NodeType.IMPORT)
    assert names(r, NodeType.CLASS) == {"Name"}
    # parameter-position and initializer-position elaborated types must
    # not become phantom structs
    assert names(r, NodeType.STRUCT) == set()
