"""Golden fixtures for scanner_parity_r5.py (PART B).

One realistic source per scanner language; EXPECTED lists are
hand-derived ground truth in the REFERENCE extractor's vocabulary
(/root/reference/crates/codegraph-parser/src/languages/*.rs), extended
with the kinds our scanners legitimately add (type_alias, constant,
macro) so extras don't masquerade as noise.  Methods are listed as
('method', name) and folded into 'function' by the harness, matching
every reference extractor's Function mapping.

Deliberate stress constructs in each fixture: decl-lookalike text in
strings and comments, braces inside literals, nesting, generics,
heritage clauses.  Where our scanner has a KNOWN gap vs the reference
(e.g. rust `use` inside a mod body, go/java package decls), the
expected entry is still present — goldens measure parity, not the
scanner's self-consistency.
"""

RUST_SRC = r'''
//! docs mention fn fake_doc() and struct DocFake { }
use std::collections::HashMap;
use std::io::{Read, Write};
use serde::Serialize as Ser;

pub mod config;

mod inner {
    use super::HashMap;
    pub fn helper() -> i32 { 1 }
}

pub struct Point<T> { x: T, y: T }

pub enum Shape {
    Circle(f32),
    Rect { w: f32, h: f32 },
}

pub trait Area {
    fn area(&self) -> f32;
}

impl Area for Point<f32> {
    fn area(&self) -> f32 { self.x * self.y }
}

impl Point<f32> {
    pub fn new(x: f32, y: f32) -> Self { Point { x, y } }
}

pub type Grid = Vec<Vec<Point<f32>>>;
pub const MAX_POINTS: usize = 1024;

macro_rules! square {
    ($x:expr) => { $x * $x };
}

fn main() {
    let s = "fn fake() { struct NotReal; } /* trait Nope */";
    let r = r#"enum RawFake { A }"#;
    let _open = '{';
    /* struct BlockCommentFake; /* nested mod nope; */ */
    println!("{} {} {}", s, r, square!(3));
}
'''

RUST_EXPECTED = [
    ("import", "std::collections::HashMap"),
    ("import", "std::io"),
    ("import", "serde::Serialize"),
    ("import", "super::HashMap"),      # known gap: scanner skips scoped use
    ("module", "config"),
    ("module", "inner"),
    ("function", "helper"),
    ("struct", "Point"),
    ("enum", "Shape"),
    ("trait", "Area"),
    ("method", "area"),                # trait signature
    ("method", "area"),                # impl body
    ("method", "new"),
    ("type_alias", "Grid"),
    ("constant", "MAX_POINTS"),
    ("macro", "square"),
    ("function", "main"),
]

JS_SRC = r'''
import fs from "fs";
import { join } from "path";
const chalk = require("chalk");

// function commentFake() {}
const banner = "function strFake() { class StrFake {} }";
const tpl = `class TplFake { method() {} } ${banner}`;

function parseArgs(argv) {
  return argv.slice(2).filter(function inner(a) { return a[0] !== "-"; });
}

async function* walk(dir) {
  yield dir;
}

const sum = (a, b) => a + b;
const logIt = async (msg) => { console.log(msg); };

class Logger {
  constructor(level) { this.level = level; }
  log(msg) { console.log(msg); }
  static create() { return new Logger("info"); }
  get prefix() { return "[log]"; }
}

class JsonLogger extends Logger {
  log(msg) { super.log(JSON.stringify(msg)); }
}

module.exports = { parseArgs, walk, sum, Logger };
'''

JS_EXPECTED = [
    ("import", "fs"),
    ("import", "path"),
    ("import", "chalk"),
    ("function", "parseArgs"),
    ("function", "inner"),
    ("function", "walk"),
    ("function", "sum"),
    ("function", "logIt"),
    ("class", "Logger"),
    ("method", "constructor"),
    ("method", "log"),
    ("method", "create"),
    ("method", "prefix"),
    ("class", "JsonLogger"),
    ("method", "log"),
]

TS_SRC = r'''
import { EventEmitter } from "events";
import type { Stats } from "fs";

// interface CommentFake {}
const what = "interface StrFake { x: number }";

export interface Vec2 {
  x: number;
  y: number;
}

export interface Named extends Vec2 {
  name: string;
}

export enum Mode {
  Fast,
  Slow,
}

export type Pair<T> = [T, T];

namespace Geometry {
  export function area(v: Vec2): number { return v.x * v.y; }
}

export abstract class Shape implements Named {
  x = 0;
  y = 0;
  name = "shape";
  abstract area(): number;
  describe(): string { return `${this.name}: ${this.area()}`; }
}

export class Box extends Shape {
  area(): number { return this.x * this.y; }
}

export const scale = (v: Vec2, k: number): Vec2 =>
  ({ x: v.x * k, y: v.y * k });

export function makeBox(): Box { return new Box(); }
'''

TS_EXPECTED = [
    ("import", "events"),
    ("import", "fs"),
    ("interface", "Vec2"),
    ("interface", "Named"),
    ("enum", "Mode"),
    ("type_alias", "Pair"),
    ("module", "Geometry"),
    ("function", "area"),
    ("class", "Shape"),
    ("method", "area"),        # abstract signature
    ("method", "describe"),
    ("class", "Box"),
    ("method", "area"),
    ("function", "scale"),
    ("function", "makeBox"),
]

GO_SRC = r'''
package geometry

import (
	"fmt"
	"math"
)

import "strings"

// func commentFake() {}
const Version = "v1.2.3 func strFake() {}"

type Point struct {
	X, Y float64
}

type Shaper interface {
	Area() float64
}

type Radius = float64

func New(x, y float64) *Point {
	return &Point{X: x, Y: y}
}

func (p *Point) Area() float64 {
	return p.X * p.Y
}

func (p *Point) String() string {
	s := "struct fake { }"
	return fmt.Sprintf("(%v, %v) %s %s", p.X, p.Y, s, strings.ToUpper("x"))
}

func Dist(a, b *Point) float64 {
	return math.Hypot(a.X-b.X, a.Y-b.Y)
}
'''

GO_EXPECTED = [
    ("module", "geometry"),    # known gap: scanner has no package decl
    ("import", "fmt"),         # grouped import = one node, name = first
    ("import", "strings"),
    ("constant", "Version"),
    ("struct", "Point"),
    ("interface", "Shaper"),
    ("type_alias", "Radius"),
    ("function", "New"),
    ("method", "Area"),
    ("method", "String"),
    ("function", "Dist"),
]

JAVA_SRC = r'''
package com.example.geo;

import java.util.List;
import java.util.ArrayList;
import static java.lang.Math.hypot;

// class CommentFake {}
public class Point implements Shaped, Comparable<Point> {
    private static final String NOTE = "class StrFake { void m() {} }";
    private final double x;
    private final double y;

    public Point(double x, double y) {
        this.x = x;
        this.y = y;
    }

    public double area() {
        return x * y;
    }

    @Override
    public int compareTo(Point other) {
        return Double.compare(area(), other.area());
    }
}

interface Shaped {
    double area();
}

enum Mode {
    FAST, SLOW;

    public boolean quick() {
        return this == FAST;
    }
}

record Pair(double a, double b) {
    public double sum() {
        return a + b;
    }
}
'''

JAVA_EXPECTED = [
    ("module", "com.example.geo"),   # known gap: no package decl
    ("import", "java.util.List"),
    ("import", "java.util.ArrayList"),
    ("import", "java.lang.Math.hypot"),
    ("class", "Point"),
    ("method", "Point"),
    ("method", "area"),
    ("method", "compareTo"),
    ("interface", "Shaped"),
    ("method", "area"),              # interface signature
    ("enum", "Mode"),
    ("method", "quick"),
    ("class", "Pair"),               # record folds to class (java.rs)
    ("method", "sum"),
]

CSHARP_SRC = r'''
using System;
using System.Collections.Generic;

namespace Example.Geo
{
    // class CommentFake {}
    public interface IShaped
    {
        double Area();
    }

    public struct Size
    {
        public double W;
        public double H;
    }

    public enum Mode
    {
        Fast,
        Slow,
    }

    public class Point : Object, IShaped, IComparable<Point>
    {
        private const string Note = "class StrFake { void M() {} }";
        public double X { get; set; }
        public double Y { get; set; }

        public Point(double x, double y)
        {
            X = x;
            Y = y;
        }

        public double Area()
        {
            return X * Y;
        }

        public int CompareTo(Point other)
        {
            return Area().CompareTo(other.Area());
        }
    }

    public record Pair(double A, double B);
}
'''

CSHARP_EXPECTED = [
    ("import", "System"),
    ("import", "System.Collections.Generic"),
    ("module", "Example.Geo"),
    ("interface", "IShaped"),
    ("method", "Area"),          # interface signature
    ("struct", "Size"),
    ("enum", "Mode"),
    ("class", "Point"),
    ("method", "Point"),
    ("method", "Area"),
    ("method", "CompareTo"),
    ("class", "Pair"),
]

CPP_SRC = r'''
#include <vector>
#include <cmath>
#include "geometry.h"

// class CommentFake {};
namespace geo {

const char* kNote = "class StrFake { void m(); }";

struct Size {
    double w;
    double h;
};

enum class Mode { kFast, kSlow };

using Grid = std::vector<std::vector<double>>;

class Point : public Shaped {
public:
    Point(double x, double y) : x_(x), y_(y) {}
    double area() const { return x_ * y_; }
    double dist(const Point& o) const;

private:
    double x_;
    double y_;
};

double Point::dist(const Point& o) const {
    return std::hypot(x_ - o.x_, y_ - o.y_);
}

double free_area(const Size& s) {
    return s.w * s.h;
}

}  // namespace geo
'''

CPP_EXPECTED = [
    ("import", "vector"),
    ("import", "cmath"),
    ("import", "geometry.h"),
    ("module", "geo"),
    ("struct", "Size"),
    ("enum", "Mode"),
    ("type_alias", "Grid"),
    ("class", "Point"),
    ("method", "Point"),
    ("method", "area"),
    ("method", "dist"),          # in-class declaration
    ("method", "dist"),          # out-of-class definition
    ("function", "free_area"),
]

PHP_SRC = r'''<?php
namespace Example\Geo;

use Example\Util\Logger;
use Example\Util\Math as M;

// function commentFake() {}
const NOTE = "function strFake() { class StrFake {} }";

interface Shaped
{
    public function area(): float;
}

trait Describable
{
    public function describe(): string
    {
        return static::class;
    }
}

class Point implements Shaped
{
    use Describable;

    private float $x;
    private float $y;

    public function __construct(float $x, float $y)
    {
        $this->x = $x;
        $this->y = $y;
    }

    public function area(): float
    {
        return $this->x * $this->y;
    }
}

function free_area(Point $p): float
{
    return $p->area();
}
'''

PHP_EXPECTED = [
    ("module", "Example\\Geo"),
    ("import", "Example\\Util\\Logger"),
    ("import", "Example\\Util\\Math"),
    ("interface", "Shaped"),
    ("method", "area"),           # interface signature
    ("trait", "Describable"),
    ("method", "describe"),
    ("class", "Point"),
    ("method", "__construct"),
    ("method", "area"),
    ("function", "free_area"),
]

RUBY_SRC = r'''
require "json"
require_relative "util"

# class CommentFake; end
NOTE = "class StrFake; def fake; end; end"

module Geo
  class Point < Struct.new(:x, :y)
    include Comparable

    def area
      x * y
    end

    def <=>(other)
      area <=> other.area
    end

    def self.origin
      new(0, 0)
    end
  end

  def self.dist(a, b)
    Math.hypot(a.x - b.x, a.y - b.y) if a && b
  end
end

def free_area(p)
  p.area
end
'''

RUBY_EXPECTED = [
    ("import", "json"),
    ("import", "util"),
    ("module", "Geo"),
    ("class", "Point"),
    ("method", "area"),
    ("method", "<=>"),
    ("method", "origin"),
    ("method", "dist"),
    ("function", "free_area"),
]

SWIFT_SRC = r'''
import Foundation
import CoreGraphics

// class CommentFake {}
let note = "class StrFake { func fake() {} }"

protocol Shaped {
    func area() -> Double
}

struct Size {
    var w: Double
    var h: Double
}

enum Mode {
    case fast
    case slow
}

class Point: NSObject, Shaped {
    let x: Double
    let y: Double

    init(x: Double, y: Double) {
        self.x = x
        self.y = y
    }

    func area() -> Double {
        return x * y
    }
}

extension Point {
    func scaled(by k: Double) -> Point {
        return Point(x: x * k, y: y * k)
    }
}

func freeArea(_ s: Size) -> Double {
    return s.w * s.h
}
'''

SWIFT_EXPECTED = [
    ("import", "Foundation"),
    ("import", "CoreGraphics"),
    ("interface", "Shaped"),       # protocol -> Interface (swift.rs)
    ("method", "area"),            # protocol requirement
    ("struct", "Size"),
    ("enum", "Mode"),
    ("class", "Point"),
    ("method", "init"),
    ("method", "area"),
    ("method", "scaled"),          # extension method
    ("function", "freeArea"),
]

KOTLIN_SRC = r'''
package com.example.geo

import kotlin.math.hypot
import java.util.ArrayList

// class CommentFake
val note = "class StrFake { fun fake() {} }"

typealias Grid = List<List<Double>>

interface Shaped {
    fun area(): Double
}

enum class Mode {
    FAST, SLOW
}

data class Point(val x: Double, val y: Double) : Shaped {
    override fun area(): Double = x * y

    fun dist(o: Point): Double {
        return hypot(x - o.x, y - o.y)
    }
}

object Registry {
    val points = ArrayList<Point>()
}

fun Point.scaled(k: Double): Point = Point(x * k, y * k)

fun freeArea(p: Point): Double {
    return p.area()
}
'''

KOTLIN_EXPECTED = [
    ("import", "kotlin.math.hypot"),
    ("import", "java.util.ArrayList"),
    ("type_alias", "Grid"),
    ("interface", "Shaped"),
    ("method", "area"),            # interface signature
    ("enum", "Mode"),
    ("class", "Point"),
    ("method", "area"),
    ("method", "dist"),
    ("module", "Registry"),        # object -> MODULE (scanner contract)
    ("method", "scaled"),          # extension fun (receiver => method)
    ("function", "freeArea"),
]

DART_SRC = r'''
import 'dart:math';
import 'package:meta/meta.dart';
export 'src/util.dart';

// class CommentFake {}
const note = "class StrFake { void fake() {} }";

typedef Grid = List<List<double>>;

enum Mode { fast, slow }

abstract class Shaped {
  double area();
}

class Point extends Object with Comparable implements Shaped {
  final double x;
  final double y;

  Point(this.x, this.y);

  @override
  double area() {
    return x * y;
  }

  double dist(Point o) {
    return sqrt(pow(x - o.x, 2) + pow(y - o.y, 2));
  }
}

double freeArea(Point p) {
  return p.area();
}
'''

DART_EXPECTED = [
    ("import", "dart:math"),
    ("import", "package:meta/meta.dart"),
    ("import", "src/util.dart"),   # export re-exports count as imports
    ("type_alias", "Grid"),
    ("enum", "Mode"),
    ("class", "Shaped"),
    ("method", "area"),            # abstract signature
    ("class", "Point"),
    ("method", "Point"),           # constructor
    ("method", "area"),
    ("method", "dist"),
    ("function", "freeArea"),
]

FIXTURES = {
    "rust": (RUST_SRC, RUST_EXPECTED),
    "javascript": (JS_SRC, JS_EXPECTED),
    "typescript": (TS_SRC, TS_EXPECTED),
    "go": (GO_SRC, GO_EXPECTED),
    "java": (JAVA_SRC, JAVA_EXPECTED),
    "csharp": (CSHARP_SRC, CSHARP_EXPECTED),
    "cpp": (CPP_SRC, CPP_EXPECTED),
    "php": (PHP_SRC, PHP_EXPECTED),
    "ruby": (RUBY_SRC, RUBY_EXPECTED),
    "swift": (SWIFT_SRC, SWIFT_EXPECTED),
    "kotlin": (KOTLIN_SRC, KOTLIN_EXPECTED),
    "dart": (DART_SRC, DART_EXPECTED),
}
