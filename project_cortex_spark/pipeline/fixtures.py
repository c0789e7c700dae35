"""Fixed multi-language source fixtures shared by the contract queries
and the unit tests.

These are the golden inputs for the `pipeline_parse_multilang` and
`graph_type_usages_params` contract queries: parsing is not
SQL-expressible, but over a FIXED corpus the full extraction output is
exact, so the driver's oracle is a golden VALUES table — any drift in
the parsers (spans, params, complexity, receivers) breaks the hash.
Shapes mirror the reference's own per-language test files
(/root/reference/testdata/code/{go,typescript,javascript}/simple.*)
without copying them.
"""

GO_SRC = '''\
package server

import (
\t"fmt"
\talias "net/http"
)

import "strings"

const (
\tDefaultPort    = 8080
\tDefaultTimeout = 30
)

var globalConfig = Config{Port: DefaultPort}

const greeting = "hello // not a comment {"

type Config struct {
\tPort    int
\tTimeout int
\tNames   []string
}

type Router interface {
\tRoute(path string) error
}

type ID = int64

func NewConfig(port, timeout int, opts ...string) (*Config, error) {
\tif port <= 0 {
\t\treturn nil, fmt.Errorf("bad port")
\t}
\tfor _, o := range opts {
\t\tvalidate(o)
\t}
\treturn &Config{Port: port}, nil
}

func (c *Config) Addr(host string) string {
\treturn host
}

func validate(s string) bool {
\treturn len(s) > 0 && s != "{"
}
'''

TS_SRC = '''\
import { Logger } from "./log";
import * as util from "./util";

const LIMIT = 10;
let counter: number = 0;

type Key = string;

interface Item {
  id: Key;
  label?: string;
  render(depth: number): string;
}

class Store {
  private items: Item[] = [];

  constructor(max: number) {}

  add(item: Item, tag = "x"): void {
    if (this.items.length < LIMIT && item.id) {
      this.items.push(item);
    }
  }
}

function lookup(id: Key, strict: boolean): Item | undefined {
  for (const it of cache()) {
    if (it.id === id) { return it; }
  }
  return undefined;
}

const scale = (x: number, k: number): number => {
  return x * k;
};

const inc = x => x + 1;
'''

JS_SRC = '''\
const URL = "https://x.example/{}";
let active = 0;

class Pool {
  constructor(size) {
    this.size = size;
  }

  take() {
    if (active < this.size) { return open(); }
    return null;
  }
}

function makePool(n) {
  return new Pool(n || 4);
}

module.exports = { Pool, makePool };
'''

PY_SRC = '''\
import os
from collections import defaultdict as dd

MAX_DEPTH = 5

def helper(x: str) -> str:
    return os.path.join(x, "y")

class Greeter:
    default_punct: str = "!"

    def greet(self, name: str, punct: str) -> str:
        if name and punct:
            return helper(name) + punct
        return name

def main():
    g = Greeter()
    return g.greet("hi", "!")
'''

MD_SRC = '''\
# Engine Guide

This preamble paragraph introduces the engine and sits before the first
level-two header, so it forms its own section zero.

## Install

Grab a release and unpack it somewhere on your PATH. The installer
verifies checksums before it writes anything.

```bash
engine install --verify
## a fence-internal line that must NOT start a new section
engine doctor {check}
```

A short post-install note confirms the doctor command passed.

## Query Model

''' + (
    "Queries compile to a logical plan before any execution happens. "
    "The optimizer prunes columns and pushes filters toward the scan. "
    "Partitions only shuffle when a join or aggregation requires it. "
    "Broadcast joins replicate the small side to every worker node. "
) * 10 + '''

## FAQ

Short answers only.
'''

RS_SRC = '''\
use std::collections::BTreeMap;

pub const RETRY_LIMIT: u32 = 4;

pub struct Cache {
    entries: BTreeMap<String, String>,
}

pub trait Evict {
    fn evict(&mut self, key: &str) -> bool;
}

impl Cache {
    pub fn insert(&mut self, key: String, val: String) -> Option<String> {
        if key.is_empty() {
            return None;
        }
        self.entries.insert(key, val)
    }
}

impl Evict for Cache {
    fn evict(&mut self, key: &str) -> bool {
        self.entries.remove(key).is_some() && !key.is_empty()
    }
}
'''

JAVA_SRC = '''\
package app.core;

import java.util.HashMap;

public class Ledger {
    private static final int MAX_SLOTS = 64;
    private HashMap<String, Long> balances;

    public Ledger() {
        this.balances = new HashMap<>();
    }

    public long credit(String account, long amount) {
        if (amount > 0 && balances.containsKey(account)) {
            return balances.merge(account, amount, Long::sum);
        }
        return 0;
    }
}

interface Audited {
    void record(String event);
}
'''

C_SRC = '''\
#include <stdlib.h>

#define SLOT_COUNT 16

static int hits = 0;

struct Slot {
    int key;
    int value;
};

int probe(struct Slot* table, int key) {
    for (int i = 0; i < SLOT_COUNT; i++) {
        if (table[i].key == key) {
            return table[i].value;
        }
    }
    return -1;
}
'''

PHP_SRC = '''\
<?php

namespace App\\Cache;

use App\\Contracts\\Store;

const TTL_SECONDS = 300;

class MemoryStore
{
    private array $items = [];

    public function put(string $key, mixed $value): bool
    {
        if ($key !== '') {
            $this->items[$key] = $value;
            return true;
        }
        return false;
    }
}
'''

RB_SRC = '''\
require 'set'

PAGE_SIZE = 25

module Paging
  class Cursor
    def initialize(offset)
      @offset = offset
    end

    def advance(step)
      @offset += step if step > 0
      @offset
    end
  end
end

def make_cursor(offset)
  Paging::Cursor.new(offset)
end
'''

# Comment-bearing sources for the cst (concrete-syntax-exact) pattern
# tier — kept separate from MULTILANG_FILES so the md5-pinned goldens of
# the smart-tier queries stay stable.
CST_GO_SRC = '''\
package notes

func emit() {
\ttrack(1, 2)
\ttrack(1, /* mid */ 2)
\t// TODO drop retries
\tretry()
}
'''

CST_TS_SRC = '''\
function lookup(id: Key, strict: boolean): Item | undefined {
  return undefined;
}
// TODO drop retries
const fast = lookup("a", true);
'''

CST_PY_SRC = '''\
def handler(evt):
    log(evt)  # audit
    log(evt)
    return evt
'''

CST_FILES = [
    ("notes.go", CST_GO_SRC),
    ("notes.ts", CST_TS_SRC),
    ("notes.py", CST_PY_SRC),
]

MULTILANG_FILES = [
    ("demo.py", PY_SRC),
    ("srv.go", GO_SRC),
    ("store.ts", TS_SRC),
    ("pool.js", JS_SRC),
    ("cache.rs", RS_SRC),
    ("ledger.java", JAVA_SRC),
    ("slot.c", C_SRC),
    ("memstore.php", PHP_SRC),
    ("cursor.rb", RB_SRC),
]
