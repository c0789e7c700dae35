"""Go / TypeScript / JavaScript scanner parsers: exact entity sets,
masking robustness, parameter/field/complexity extraction (reference
contract: internal/indexer/parser.go, parsers/typescript.go,
storage/schema.go:200-249)."""

from __future__ import annotations

from project_cortex_spark.pipeline.parse import PARSERS
from project_cortex_spark.pipeline.fixtures import GO_SRC as GO
from project_cortex_spark.pipeline.fixtures import JS_SRC as JS
from project_cortex_spark.pipeline.fixtures import TS_SRC as TS



def _rows(lang, path, src):
    return PARSERS[lang](path, src)


def _by_kind(rows):
    out = {}
    for r in rows:
        out.setdefault(r[1], []).append(r)
    return out


class TestGoParser:
    def setup_method(self):
        self.by = _by_kind(_rows("go", "srv.go", GO))

    def test_package_and_imports(self):
        assert [r[2] for r in self.by["package"]] == ["server"]
        imports = {r[2]: r[8] for r in self.by["import"]}
        assert imports == {
            "fmt": None, "net/http": "alias", "strings": None,
        }

    def test_types(self):
        types = {r[2]: (r[8], r[4], r[5]) for r in self.by["type"]}
        assert types["Config"] == ("struct", 19, 23)
        assert types["Router"] == ("interface", 25, 27)
        assert types["ID"][0] == "alias"

    def test_struct_fields(self):
        fields = {
            r[2]: (r[10], r[11])
            for r in self.by["field"] if r[3] == "Config"
        }
        assert fields == {
            "Port": (0, "int"), "Timeout": (1, "int"), "Names": (2, "[]string")
        }

    def test_consts_and_vars(self):
        consts = {r[2]: r[8] for r in self.by["const"]}
        assert consts["DefaultPort"] == "8080"
        assert consts["DefaultTimeout"] == "30"
        # masked scan must not lose the const whose VALUE contains // and {
        assert "greeting" in consts
        assert [r[2] for r in self.by["var"]] == ["globalConfig"]

    def test_functions_receivers_complexity(self):
        funcs = {r[2]: r for r in self.by["function"]}
        assert set(funcs) == {"NewConfig", "Addr", "validate"}
        assert funcs["Addr"][3] == "Config" and funcs["Addr"][7] is True
        assert funcs["NewConfig"][7] is False
        assert funcs["NewConfig"][6] == 3  # port, timeout, opts
        # 1 + if + for + (&& from validate is elsewhere): NewConfig = 3
        assert funcs["NewConfig"][9] == 3
        assert funcs["validate"][9] == 2  # 1 + &&

    def test_grouped_and_variadic_params(self):
        params = {
            r[2]: (r[10], r[11], r[8])
            for r in self.by["param"]
            if r[3] == "NewConfig" and not r[12]
        }
        # grouped sugar: port inherits int from timeout
        assert params["port"] == (0, "int", None)
        assert params["timeout"] == (1, "int", None)
        assert params["opts"] == (2, "...string", "variadic")

    def test_return_params(self):
        rets = [
            r for r in self.by["param"] if r[3] == "NewConfig" and r[12]
        ]
        assert [(r[10], r[11]) for r in rets] == [(0, "*Config"), (1, "error")]

    def test_calls_resolved_to_enclosing_function(self):
        calls = {(r[3], r[2]) for r in self.by["call"]}
        assert ("NewConfig", "Errorf") in calls
        assert ("NewConfig", "validate") in calls
        assert ("validate", "len") in calls

    def test_braces_in_strings_do_not_break_spans(self):
        funcs = {r[2]: (r[4], r[5]) for r in self.by["function"]}
        assert funcs["validate"] == (45, 47)  # not swallowed by "{" literal




class TestTsParser:
    def setup_method(self):
        self.by = _by_kind(_rows("ts", "store.ts", TS))

    def test_imports(self):
        imports = {r[2]: r[8] for r in self.by["import"]}
        assert imports == {"./log": "{ Logger }", "./util": "* as util"}

    def test_types(self):
        types = {r[2]: r[8] for r in self.by["type"]}
        assert types["Store"] == "class"
        assert types["Item"] == "interface"
        assert types["Key"] == "alias"

    def test_interface_members(self):
        fields = {r[2]: (r[10], r[11], r[8]) for r in self.by["field"]}
        assert fields["id"] == (0, "Key", None)
        assert fields["label"] == (1, "string", "optional")
        assert fields["render"][2] is None  # method member, still a field row

    def test_data_rows(self):
        consts = {r[2]: r[8] for r in self.by["const"]}
        assert consts == {"LIMIT": "10"}  # scale/inc became functions
        variables = {r[2]: (r[11], r[8]) for r in self.by["var"]}
        assert variables == {"counter": ("number", "0")}

    def test_functions_methods_arrows(self):
        funcs = {r[2]: r for r in self.by["function"]}
        assert set(funcs) == {"constructor", "add", "lookup", "scale", "inc"}
        assert funcs["add"][3] == "Store" and funcs["add"][7] is True
        assert funcs["add"][6] == 2
        assert funcs["scale"][8] == "arrow" and funcs["scale"][6] == 2
        assert funcs["inc"][8] == "arrow" and funcs["inc"][6] == 1
        # complexity: add = 1 + if + && = 3; lookup = 1 + for + if = 3
        assert funcs["add"][9] == 3
        assert funcs["lookup"][9] == 3

    def test_params_and_returns(self):
        ret = [r for r in self.by["param"] if r[3] == "lookup" and r[12]]
        assert [r[11] for r in ret] == ["Item | undefined"]
        ps = {
            r[2]: (r[10], r[11])
            for r in self.by["param"] if r[3] == "scale"
        }
        assert ps == {"x": (0, "number"), "k": (1, "number")}

    def test_calls(self):
        calls = {(r[3], r[2]) for r in self.by["call"]}
        assert ("add", "push") in calls
        assert ("lookup", "cache") in calls




class TestJsParser:
    def setup_method(self):
        self.by = _by_kind(_rows("js", "pool.js", JS))

    def test_entities(self):
        assert [r[2] for r in self.by["type"]] == ["Pool"]
        funcs = {r[2]: r for r in self.by["function"]}
        assert set(funcs) == {"constructor", "take", "makePool"}
        assert funcs["take"][3] == "Pool"
        assert funcs["makePool"][6] == 1
        assert funcs["makePool"][9] == 2  # 1 + ||
        calls = {(r[3], r[2]) for r in self.by["call"]}
        assert ("take", "open") in calls
        assert ("makePool", "Pool") in calls

    def test_untyped_params(self):
        ps = [r for r in self.by["param"] if r[3] == "constructor"]
        assert [(r[2], r[11]) for r in ps] == [("size", None)]


class TestMasking:
    def test_mask_preserves_offsets_and_newlines(self):
        from project_cortex_spark.pipeline.parsers import mask_code

        src = 'a = "x{y}\\"z" // c {\nb = 2 /* {\n} */ c = `t{'
        masked = mask_code(src, raw_strings="`")
        assert len(masked) == len(src)
        assert masked.count("\n") == src.count("\n")
        assert "{" not in masked
        assert masked.split("\n")[1].startswith("b = 2")

    def test_reference_fixture_shapes(self):
        # shape parity with the reference's own simple.* test files:
        # same entity KINDS come out of the same constructs
        go = open("/root/reference/testdata/code/go/simple.go").read()
        by = _by_kind(_rows("go", "simple.go", go))
        assert {r[2] for r in by["type"]} == {"Config", "Handler"}
        assert {r[2] for r in by["function"]} == {"NewHandler", "ServeHTTP"}
        ts = open("/root/reference/testdata/code/typescript/simple.ts").read()
        by = _by_kind(_rows("ts", "simple.ts", ts))
        assert {r[2] for r in by["type"]} == {"UserService", "User", "UserId"}
        assert {r[2] for r in by["function"]} == {
            "UserService", "addUser", "getUser", "validateEmail", "constructor",
        } - {"UserService"}


REF = "/root/reference/testdata/code"


class TestRustParser:
    def setup_method(self):
        self.by = _by_kind(
            _rows("rs", "simple.rs", open(f"{REF}/rust/simple.rs").read())
        )

    def test_types(self):
        types = {r[2]: r[8] for r in self.by["type"]}
        assert types == {
            "User": "struct", "UserRepository": "struct",
            "Repository": "interface", "Status": "enum",
        }

    def test_impl_methods_carry_receiver(self):
        funcs = {(r[2], r[3]) for r in self.by["function"]}
        assert ("new", "User") in funcs
        assert ("validate", "User") in funcs
        assert ("add", "UserRepository") in funcs  # trait impl for target
        assert ("create_user", None) in funcs

    def test_trait_signatures_are_methods(self):
        trait_fns = [r for r in self.by["function"] if r[3] == "Repository"]
        assert {r[2] for r in trait_fns} == {"add", "get", "remove"}
        assert all(r[4] == r[5] for r in trait_fns)  # no body: 1-line span

    def test_consts_statics_imports_fields(self):
        assert {r[2] for r in self.by["const"]} == {"MAX_USERS", "DEFAULT_TIMEOUT"}
        assert [r[2] for r in self.by["var"]] == ["GLOBAL_COUNTER"]
        assert {r[2] for r in self.by["import"]} == {
            "std::collections::HashMap", "std::fmt",
        }
        fields = {(r[3], r[2]) for r in self.by["field"]}
        assert ("User", "email") in fields and ("UserRepository", "users") in fields

    def test_returns_and_complexity(self):
        rets = {r[3]: r[11] for r in self.by["param"] if r[12]}
        assert rets["create_user"] == "User"
        funcs = {r[2:4]: r for r in self.by["function"]}
        add_impl = next(r for r in self.by["function"]
                        if r[2] == "add" and r[3] == "UserRepository")
        assert add_impl[9] == 2  # 1 + if


class TestJavaParser:
    def setup_method(self):
        self.by = _by_kind(
            _rows("java", "simple.java", open(f"{REF}/java/simple.java").read())
        )

    def test_package_imports_types(self):
        assert [r[2] for r in self.by["package"]] == ["com.example.app"]
        assert {r[2] for r in self.by["import"]} == {
            "java.util.ArrayList", "java.util.List", "java.util.Optional",
        }
        types = {r[2]: r[8] for r in self.by["type"]}
        assert types == {
            "UserService": "class", "User": "class",
            "Repository": "interface", "UserStatus": "enum",
        }

    def test_methods_and_constructor(self):
        funcs = {(r[2], r[3]): r for r in self.by["function"]}
        assert ("UserService", "UserService") in funcs  # ctor
        assert funcs[("addUser", "UserService")][6] == 1
        assert funcs[("addUser", "UserService")][9] == 2  # 1 + if
        assert funcs[("validate", "User")][9] == 2  # 1 + &&
        assert ("add", "Repository") in funcs  # interface signature

    def test_static_final_is_const(self):
        consts = {r[2] for r in self.by["const"]}
        assert consts == {"API_KEY", "MAX_RETRIES"}
        fields = {r[2] for r in self.by["field"]}
        assert "globalCounter" in fields and "users" in fields


class TestCParser:
    def setup_method(self):
        self.by = _by_kind(
            _rows("c", "simple.c", open(f"{REF}/c/simple.c").read())
        )

    def test_includes_defines_globals(self):
        assert {r[2] for r in self.by["import"]} == {
            "stdio.h", "stdlib.h", "string.h",
        }
        consts = {r[2]: r[8] for r in self.by["const"]}
        assert consts["MAX_USERS"] == "100"
        assert "DEFAULT_PORT" in consts
        assert [r[2] for r in self.by["var"]] == ["connection_count"]

    def test_structs_typedefs_functions(self):
        types = {(r[2], r[8]) for r in self.by["type"]}
        assert ("User", "struct") in types and ("User", "alias") in types
        funcs = {r[2]: r for r in self.by["function"]}
        assert set(funcs) == {
            "create_repository", "add_user", "find_user", "free_repository",
        }
        assert funcs["add_user"][6] == 2
        assert funcs["find_user"][9] == 3  # 1 + for + if
        fields = {(r[3], r[2]) for r in self.by["field"]}
        assert ("User", "id") in fields and ("UserRepository", "count") in fields


class TestCppParser:
    def setup_method(self):
        self.by = _by_kind(
            _rows("cpp", "simple.cpp", open(f"{REF}/cpp/simple.cpp").read())
        )

    def test_classes_and_methods(self):
        types = {r[2]: r[8] for r in self.by["type"]}
        assert types["User"] == "class" and types["Repository"] == "class"
        assert types["Point"] == "struct" and types["UserRepository"] == "alias"
        funcs = {(r[2], r[3]) for r in self.by["function"]}
        assert ("validate", "User") in funcs
        assert ("add", "Repository") in funcs
        assert ("User", "User") in funcs  # constructor
        # initializer-list lines are not methods
        assert not any(r[2] in ("id", "name", "email")
                       for r in self.by["function"])

    def test_typed_member_fields(self):
        fields = {(r[3], r[2]): r[11] for r in self.by["field"]}
        assert fields[("User", "email")] == "std::string"
        assert fields[("Repository", "items")] == "std::vector<T>"


class TestPhpParser:
    def setup_method(self):
        self.by = _by_kind(
            _rows("php", "simple.php", open(f"{REF}/php/simple.php").read())
        )

    def test_namespace_uses_types(self):
        assert [r[2] for r in self.by["package"]] == ["App\\Service"]
        assert {r[2] for r in self.by["import"]} == {
            "App\\Model\\User", "App\\Repository\\RepositoryInterface",
        }
        types = {r[2]: r[8] for r in self.by["type"]}
        assert types == {
            "UserService": "class", "User": "class",
            "RepositoryInterface": "interface", "Timestampable": "trait",
        }

    def test_methods_params_returns(self):
        funcs = {(r[2], r[3]): r for r in self.by["function"]}
        assert funcs[("addUser", "UserService")][6] == 1
        assert funcs[("findById", "UserService")][9] == 3  # 1 + foreach + if
        params = {(r[3], r[2]): r[11] for r in self.by["param"] if not r[12]}
        assert params[("addUser", "user")] == "User"
        # findById exists on the class (?User) AND the interface (mixed)
        fid_rets = {r[11] for r in self.by["param"]
                    if r[12] and r[3] == "findById"}
        assert fid_rets == {"?User", "mixed"}
        rets = {r[3]: r[11] for r in self.by["param"] if r[12]}
        assert rets["validate"] == "bool"

    def test_consts_and_properties(self):
        assert {r[2] for r in self.by["const"]} == {
            "API_KEY", "MAX_RETRIES", "DEFAULT_LIMIT",
        }
        fields = {(r[3], r[2]) for r in self.by["field"]}
        assert ("UserService", "users") in fields
        assert ("Timestampable", "createdAt") in fields


class TestRubyParser:
    def setup_method(self):
        self.by = _by_kind(
            _rows("rb", "simple.rb", open(f"{REF}/ruby/simple.rb").read())
        )

    def test_modules_classes_nesting(self):
        types = {r[2]: (r[8], r[3]) for r in self.by["type"]}
        assert types["UserManagement"] == ("module", None)
        assert types["User"] == ("class", "UserManagement")
        assert types["UserRepository"] == ("class", "UserManagement")

    def test_methods_with_receivers(self):
        funcs = {(r[2], r[3]): r for r in self.by["function"]}
        assert funcs[("initialize", "User")][6] == 3
        assert ("validate", "User") in funcs
        assert ("find_by_id", "UserRepository") in funcs
        assert ("create_user", None) in funcs
        assert ("validate_email", None) in funcs

    def test_consts_globals_requires(self):
        assert {r[2] for r in self.by["const"]} == {
            "API_KEY", "MAX_RETRIES", "DEBUG_MODE",
        }
        assert [r[2] for r in self.by["var"]] == ["$global_counter"]
        assert {r[2] for r in self.by["import"]} == {"json", "net/http"}

    def test_end_matching_spans(self):
        funcs = {r[2]: (r[4], r[5]) for r in self.by["function"]
                 if r[3] == "User"}
        assert funcs["initialize"] == (14, 18)
        assert funcs["to_hash"] == (24, 30)


class TestParserRobustness:
    """Parsers must never crash on arbitrary input — the reference
    logs-and-skips unparseable files; we degrade to missed entities."""

    LANGS = ["go", "ts", "js", "rs", "java", "c", "cpp", "php", "rb", "py"]

    def _check_invariants(self, lang, text):
        from project_cortex_spark.pipeline.parse import KINDS, PARSERS

        rows = PARSERS[lang](f"f.{lang}", text)
        n_lines = text.count("\n") + 1
        for r in rows:
            assert r[1] in KINDS + ("error",), r
            assert 0 <= r[4] <= n_lines + 1, ("start_line", r)
            assert r[4] <= r[5] or r[5] == 0, ("span", r)
            assert isinstance(r[6], int) and r[6] >= 0
        # determinism
        assert rows == PARSERS[lang](f"f.{lang}", text)

    def test_fuzz_structured_fragments(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        fragments = st.lists(
            st.sampled_from([
                "func f(a int) {", "}", "{", "def f(x):", "class X:",
                "fn main() {", "public class Y {", "impl X {", "end",
                "def g", "type T struct {", "x := y(", '"unterminated',
                "/* open comment", "// line", "# hash", "```", "($a, $b)",
                "const X = 1;", "'quote", "`backtick", "\t\t", "",
                "interface I {", "trait T {", "module M", "require 'x'",
                "λ unicode ♥", "a(b(c(d(", "))))", "-> int:", "=> {",
            ]),
            min_size=0, max_size=25,
        )

        @settings(max_examples=40, deadline=None)
        @given(fragments)
        def run(lines):
            text = "\n".join(lines)
            for lang in self.LANGS:
                self._check_invariants(lang, text)

        run()

    def test_empty_and_binaryish(self):
        for lang in self.LANGS:
            self._check_invariants(lang, "")
            self._check_invariants(lang, "\x00\x01\x02 binary ish \xff")
            self._check_invariants(lang, "{" * 2000)
            self._check_invariants(lang, "(" * 2000)


class TestAdversarialFixtures:
    """VERDICT r2 item 6: syntax the masking scanner is most likely to
    misread. Each case asserts correct extraction where the scanner can
    deliver it, and clean degradation (valid spans, no phantom entities)
    where it cannot."""

    def _spans_valid(self, rows, text):
        n_lines = text.count("\n") + 1
        for r in rows:
            assert 1 <= r[4] <= n_lines, ("start", r)
            assert r[4] <= r[5] <= n_lines or r[5] == 0, ("end", r)

    def test_ts_nested_generics(self):
        src = """
interface Cache<K extends string, V extends Map<string, Array<number>>> {
    get(key: K): V | undefined;
}

function transform<T extends Map<string, Array<number>>>(
    input: Map<string, T>,
    fn: (v: T) => Promise<Array<T>>,
): Promise<Map<string, T>> {
    return Promise.resolve(input);
}
"""
        rows = _rows("ts", "g.ts", src)
        self._spans_valid(rows, src)
        by = _by_kind(rows)
        assert [r[2] for r in by["type"]] == ["Cache"]
        names = {r[2] for r in by["function"]}
        assert "transform" in names
        tf = next(r for r in by["function"] if r[2] == "transform")
        assert tf[4] == 6 and tf[5] == 11  # generics/arrow-typed params
        # don't break the brace-matched span
        params = {r[2] for r in by.get("param", []) if r[3] == "transform"}
        assert "input" in params and "fn" in params

    def test_ts_arrow_soup(self):
        src = """
const curry = (a: number) => (b: number) => (c: number) => a + b + c;
const handlers = {
    onClick: async (e: Event) => { await log(e); },
};
export const pipe = <T,>(...fns: Array<(x: T) => T>) => (x: T): T =>
    fns.reduce((acc, f) => f(acc), x);

function plain(n: number): number { return n; }
"""
        rows = _rows("ts", "a.ts", src)
        self._spans_valid(rows, src)
        by = _by_kind(rows)
        fnames = {r[2] for r in by["function"]}
        # declared arrow consts surface as functions; the inner anonymous
        # arrows must NOT produce phantom named entities
        assert "curry" in fnames and "plain" in fnames
        assert not any(n in fnames for n in ("acc", "f", "x", "b", "c"))

    def test_rust_lifetimes_near_char_literals(self):
        src = """
const OPEN: char = '{';
const CLOSE: char = '}';

pub fn longest<'a, 'b: 'a>(x: &'a str, y: &'b str) -> &'a str {
    let sep = ',';
    if x.len() > y.len() { x } else { y }
}

struct Holder<'a> {
    name: &'a str,
}

impl<'a> Holder<'a> {
    fn get(&self) -> &'a str { self.name }
}
"""
        rows = _rows("rs", "l.rs", src)
        self._spans_valid(rows, src)
        by = _by_kind(rows)
        funcs = {r[2]: (r[4], r[5]) for r in by["function"]}
        # char literals '{'/'}'/',' must not unbalance the spans
        assert funcs["longest"] == (5, 8)
        assert funcs["get"] == (15, 15)
        get = next(r for r in by["function"] if r[2] == "get")
        assert get[3] == "Holder"  # impl target as receiver
        types = {r[2] for r in by["type"]}
        assert "Holder" in types
        fields = {r[2]: r[11] for r in by.get("field", []) if r[3] == "Holder"}
        assert fields.get("name") == "&'a str"

    def test_php_heredocs(self):
        src = """<?php
namespace App;

$sql = <<<SQL
SELECT '}' FROM t WHERE x = "{"
SQL;

$tpl = <<<'HTML'
function phantom($x) {
}
HTML;

class Repo {
    public function find(int $id): ?Repo {
        return $this;
    }
}
"""
        rows = _rows("php", "h.php", src)
        self._spans_valid(rows, src)
        by = _by_kind(rows)
        fnames = {r[2] for r in by["function"]}
        assert fnames == {"find"}  # no phantom from the nowdoc body
        find = next(r for r in by["function"] if r[2] == "find")
        assert find[3] == "Repo"
        types = {r[2]: (r[4], r[5]) for r in by["type"]}
        assert types["Repo"] == (13, 17)

    def test_java_text_blocks(self):
        src = """
public class T {
    static final String SQL = \"\"\"
        SELECT '}' FROM t WHERE x = "{"
        \"\"\";
    public int add(int a, int b) { return a + b; }
}
"""
        rows = _rows("java", "T.java", src)
        self._spans_valid(rows, src)
        by = _by_kind(rows)
        funcs = {r[2]: (r[4], r[5]) for r in by["function"]}
        # the quote/brace soup inside the text block must not desync
        # masking and swallow the method that follows it
        assert funcs["add"] == (6, 6)
        types = {r[2]: (r[4], r[5]) for r in by["type"]}
        assert types["T"] == (2, 7)

    def test_ts_nested_template_literals(self):
        src = """
const msg = `outer ${fn({a: 1})} tail`;
function after(x: number): number {
    return x;
}
const nested = `a ${ `inner ${y}` } b`;
function last(z: string): string { return z; }
"""
        rows = _rows("ts", "t.ts", src)
        self._spans_valid(rows, src)
        by = _by_kind(rows)
        funcs = {r[2]: (r[4], r[5]) for r in by["function"]}
        assert funcs["after"] == (3, 5)
        assert funcs["last"] == (7, 7)

    def test_ruby_percent_literals(self):
        src = """
WORDS = %w[alpha beta gamma]
BRACES = %q({ not a block })
class Calc
  def add(a, b)
    a + b
  end
end
"""
        rows = _rows("rb", "c.rb", src)
        self._spans_valid(rows, src)
        by = _by_kind(rows)
        funcs = {r[2]: (r[4], r[5]) for r in by["function"]}
        assert funcs["add"] == (5, 7)
        consts = {r[2] for r in by["const"]}
        assert {"WORDS", "BRACES"} <= consts

    def test_c_if0_regions(self):
        src = """
#if 0
void disabled(int x) {
#endif

int live(int a, int b) {
    return a + b;
}

#if 0
#if 1
int nested_disabled(void) { return 0; }
#endif
#endif

int tail(void) { return 1; }
"""
        rows = _rows("c", "t.c", src)
        self._spans_valid(rows, src)
        by = _by_kind(rows)
        funcs = {r[2]: (r[4], r[5]) for r in by["function"]}
        # the unbalanced brace in the #if 0 region (C's comment-out
        # idiom) must not swallow live code or emit phantom entities
        assert set(funcs) == {"live", "tail"}
        assert funcs["live"] == (6, 8)
        assert funcs["tail"] == (16, 16)

    def test_cpp_raw_strings(self):
        src = """
const char* s = R"(raw " with } brace)";
int after(int v) { return v; }
const char* d = R"sep(contains )" and }{ soup)sep";
class K {
public:
    int m(int w) { return w; }
};
"""
        rows = _rows("cpp", "t.cpp", src)
        self._spans_valid(rows, src)
        by = _by_kind(rows)
        funcs = {r[2]: (r[4], r[5]) for r in by["function"]}
        assert funcs["after"] == (3, 3)
        assert funcs["m"] == (7, 7)

    def test_go_generics(self):
        src = """
package main

func Map[T any, U any](xs []T, f func(T) U) []U {
    out := make([]U, 0)
    return out
}

type Box[T any] struct {
    item T
}

func (b *Box[T]) Get() T {
    return b.item
}
"""
        rows = _rows("go", "g.go", src)
        self._spans_valid(rows, src)
        by = _by_kind(rows)
        funcs = {r[2]: (r[3], r[4], r[5]) for r in by["function"]}
        assert funcs["Map"] == (None, 4, 7)
        # generic receiver resolves to the base type
        assert funcs["Get"] == ("Box", 13, 15)
        params = {r[2] for r in by["param"] if r[3] == "Map" and not r[12]}
        assert params == {"xs", "f"}
        types = {r[2]: r[8] for r in by["type"]}
        assert types["Box"] == "struct"
        fields = {r[2] for r in by["field"] if r[3] == "Box"}
        assert fields == {"item"}

    def test_ruby_heredocs(self):
        src = """
SQL = <<~EOT
  def phantom(x)
  end
EOT

def real(a, b)
  a + b
end

x = 1 << 4
def after_shift(c)
  c
end
"""
        rows = _rows("rb", "h.rb", src)
        self._spans_valid(rows, src)
        by = _by_kind(rows)
        funcs = {r[2]: (r[4], r[5]) for r in by["function"]}
        # heredoc body emits nothing; the shift operator is not a heredoc
        assert set(funcs) == {"real", "after_shift"}
        assert funcs["real"] == (7, 9)
        assert funcs["after_shift"] == (12, 14)

    def test_ruby_heredoc_prefix_label_does_not_close(self):
        # a line starting with the label but continuing (EOS_TAIL) or
        # mid-text label mentions must NOT terminate the heredoc early —
        # only a standalone delimiter line closes it
        src = """
DOC = <<~EOS
  EOS_TAIL is mentioned here
  def phantom(x)
  end
EOS

def real(a)
  a
end
"""
        rows = _rows("rb", "p.rb", src)
        self._spans_valid(rows, src)
        by = _by_kind(rows)
        funcs = {r[2] for r in by["function"]}
        assert funcs == {"real"}

    def test_php_heredoc_prefix_label_does_not_close(self):
        src = """<?php
$doc = <<<EOS
EOS_TAIL keeps the heredoc open
function phantom($x) {
}
EOS;

function real(int $a): int {
    return $a;
}
"""
        rows = _rows("php", "p.php", src)
        self._spans_valid(rows, src)
        by = _by_kind(rows)
        funcs = {r[2] for r in by["function"]}
        assert funcs == {"real"}

    def test_c_if0_else_branch_stays_live(self):
        # '#if 0 ... #else <live> #endif': the #else branch is the code
        # that actually compiles and must still be extracted
        src = """
#if 0
void dead(int x) {
#else
int live_else(int a) { return a; }
#endif

#if 0
#if 1
int nested_dead(void) { return 0; }
#endif
#else
int live_after_nested(void) { return 2; }
#endif

int tail(void) { return 1; }
"""
        rows = _rows("c", "e.c", src)
        self._spans_valid(rows, src)
        by = _by_kind(rows)
        funcs = {r[2]: (r[4], r[5]) for r in by["function"]}
        assert set(funcs) == {"live_else", "live_after_nested", "tail"}
        assert funcs["live_else"] == (5, 5)
        assert funcs["live_after_nested"] == (13, 13)
        assert funcs["tail"] == (16, 16)

    def test_rust_macro_bodies_masked(self):
        # macro bodies are uninterpreted token trees: a fn-shaped line
        # inside macro_rules!/quote! must not become a phantom function,
        # and the brace soup must not desync spans of what follows
        src = """
macro_rules! make_helper {
    ($name:ident) => {
        fn phantom_inner(x: u32) -> u32 { x + 1 }
    };
    () => {};
}

pub fn real_fn(a: i32) -> i32 {
    let v = vec![1, 2, 3];
    let t = quote! {
        fn phantom_quoted() {}
    };
    matches!(a, 1 | 2);
    a
}

struct Real { x: i32 }
"""
        rows = _rows("rs", "m.rs", src)
        self._spans_valid(rows, src)
        by = _by_kind(rows)
        funcs = {r[2]: (r[4], r[5]) for r in by["function"]}
        assert set(funcs) == {"real_fn"}
        assert funcs["real_fn"] == (9, 16)
        types = {r[2] for r in by["type"]}
        assert "Real" in types

    def test_ts_decorators_and_satisfies(self):
        src = """
@Component({selector: "app", template: "<div>{}</div>"})
export class Widget {
  @Input() name: string;
  @HostListener("click", ["$event"])
  onClick(ev: Event): void { console.log(ev); }
  render(): string { return this.name; }
}
const cfg = { port: 8080 } satisfies Config;
function after(n: number): number { return n; }
"""
        rows = _rows("ts", "w.ts", src)
        self._spans_valid(rows, src)
        by = _by_kind(rows)
        funcs = {r[2]: (r[3], r[4], r[5]) for r in by["function"]}
        # decorated methods keep their class parent; the satisfies
        # expression does not derail the function that follows it
        assert funcs["onClick"] == ("Widget", 6, 6)
        assert funcs["render"] == ("Widget", 7, 7)
        assert funcs["after"] == (None, 10, 10)
        types = {r[2]: (r[4], r[5]) for r in by["type"]}
        assert types["Widget"] == (3, 8)

    def test_python_match_statement(self):
        src = """
def handle(cmd):
    match cmd:
        case {"op": "add", "args": [a, b]}:
            return a + b
        case [x, *rest] if x > 0:
            return rest
        case _:
            return None

class Later:
    def m(self):
        return 1
"""
        rows = _rows("py", "m.py", src)
        self._spans_valid(rows, src)
        by = _by_kind(rows)
        funcs = {r[2]: (r[4], r[5]) for r in by["function"]}
        assert funcs["handle"] == (2, 9)
        assert funcs["m"] == (12, 13)
        assert {r[2] for r in by["type"]} == {"Later"}

    def test_python_pep695_clean_degrade(self):
        # PEP 695 `type Alias[T] = ...` is a SyntaxError on this
        # runtime's ast — the contract is the reference's log-and-skip
        # posture: ONE error row with a valid line, no phantom entities,
        # no crash (parse.py:96-98). If the runtime gains 3.12 syntax,
        # this degrades gracefully to real extraction instead.
        src = "type Alias[T] = list[T]\n\ndef real(x):\n    return x\n"
        rows = _rows("py", "t.py", src)
        kinds = {r[1] for r in rows}
        if "error" in kinds:
            assert kinds == {"error"}
            err = rows[0]
            assert err[2] == "SyntaxError" and err[4] >= 1
        else:
            funcs = {r[2] for r in rows if r[1] == "function"}
            assert "real" in funcs


class TestParserFidelityTailR5:
    """VERDICT r4 item 8: C++ template specializations, Go generic
    return-type lists on methods, Python decorators with arguments —
    correct extraction or clean degrade, never phantom entities."""

    def _spans_valid(self, rows, src):
        n = src.count("\n") + 1
        for r in rows:
            assert 1 <= r[4] <= r[5] <= n, r

    def test_cpp_template_specializations(self):
        src = """
template <typename T>
struct Hash {
    int run(T t);
};

template <>
struct Hash<int> {
    int run(int t) { return t; }
};

template <typename T>
struct Hash<T*> {
    int deref(T* t) { return 1; }
};
"""
        rows = _rows("cpp", "h.cpp", src)
        self._spans_valid(rows, src)
        by = _by_kind(rows)
        # three definitions of the base name: primary + full + partial
        hashes = sorted((r[4], r[8]) for r in by["type"] if r[2] == "Hash")
        assert hashes == [(3, "struct"), (8, "struct"), (13, "struct")]
        funcs = {r[2]: r[3] for r in by["function"]}
        assert funcs == {"run": "Hash", "deref": "Hash"}

    def test_cpp_single_line_template_struct_primary(self):
        # a same-line template header defeats the C parser's line-start
        # 'struct' anchor; the C++ layer must still emit the type row
        src = "template <typename U> struct Box { U val; };\n"
        rows = _rows("cpp", "b.cpp", src)
        types = {(r[2], r[4], r[8]) for r in rows if r[1] == "type"}
        assert ("Box", 1, "struct") in types

    def test_go_generic_method_composite_returns(self):
        src = """
package main

type Pair[K comparable, V any] struct {
    key K
    val V
}

func (p Pair[K, V]) Swap() Pair[V, K] {
    return Pair[V, K]{}
}

func Chans() chan int {
    return nil
}

func Named() (err error) {
    return nil
}
"""
        rows = _rows("go", "p.go", src)
        self._spans_valid(rows, src)
        by = _by_kind(rows)
        rets = {r[3]: (r[2], r[11]) for r in by["param"] if r[12]}
        # a composite/keyword-headed return type is NOT a named return
        assert rets["Swap"] == ("", "Pair[V, K]")
        assert rets["Chans"] == ("", "chan int")
        assert rets["Named"] == ("err", "error")
        # no phantom positional params leaked from return types
        assert not [r for r in by["param"] if not r[12] and r[3] == "Swap"]

    def test_python_decorators_with_arguments(self):
        src = """
import functools

@app.route("/x", methods=["GET", "POST"])
def handler(req):
    return req

@functools.lru_cache(maxsize=None)
@deco(arg=lambda x: x + 1)
def cached(n):
    return n * 2
"""
        rows = _rows("py", "d.py", src)
        self._spans_valid(rows, src)
        by = _by_kind(rows)
        funcs = {r[2]: (r[4], r[5]) for r in by["function"]}
        # spans cover the def lines; decorator factory calls recorded
        assert funcs["handler"] == (5, 6)
        assert funcs["cached"] == (10, 11)
        calls = {(r[2], r[3]) for r in by["call"]}
        assert {("route", "handler"), ("lru_cache", "cached"),
                ("deco", "cached")} <= calls


class TestCppSpecializationFalsePositive:
    def test_brace_initialized_specialization_var_is_not_a_type(self):
        src = (
            "template <typename T> struct Hash { int v; };\n"
            "template <> struct Hash<long> { long v; };\n"
            "int main() {\n"
            "  struct Hash<int> h{1};\n"   # variable decl, NOT a type
            "  return h.v;\n"
            "}\n"
        )
        by = _by_kind(_rows("cpp", "spec.cpp", src))
        types = [(r[2], r[5]) for r in by.get("type", [])]
        names_at = {t for t in types}
        # the primary (line 1) and the real specialization (line 2) are
        # types; the brace-initialized variable on line 4 is not
        assert ("Hash", 1) in names_at
        assert ("Hash", 2) in names_at
        assert not any(ln == 4 for _n, ln in names_at)


class TestParserFidelityTail:
    """VERDICT r5 item 8: Python decorators with arguments and Go
    generic method type-lists — correct extraction pinned (no phantom
    entities, receivers resolved through the type-parameter list)."""

    def test_python_decorators_with_arguments(self):
        src = (
            "import functools\n"
            "from app import app\n"
            "\n"
            '@app.route("/x", methods=["GET"])\n'
            "def handler():\n"
            "    return 1\n"
            "\n"
            "@functools.lru_cache(maxsize=None)\n"
            "def cached(n):\n"
            "    return n * 2\n"
        )
        by = _by_kind(_rows("py", "t.py", src))
        funcs = {r[2]: (r[4], r[6]) for r in by["function"]}
        # decorated functions extract with their own line/arity — the
        # decorator call does not swallow or split them
        assert funcs == {"handler": (5, 0), "cached": (9, 1)}
        # the decorator calls are recorded as calls OF the function
        calls = {(r[2], r[3]) for r in by["call"]}
        assert ("route", "handler") in calls
        assert ("lru_cache", "cached") in calls

    def test_go_generic_method_type_lists(self):
        src = (
            "package pairs\n"
            "\n"
            "type Pair[K comparable, V any] struct {\n"
            "\tkey K\n"
            "\tval V\n"
            "}\n"
            "\n"
            "func (b *Pair[K, V]) Get(k K) V {\n"
            "\treturn b.val\n"
            "}\n"
            "\n"
            "func (b Pair[K, V]) Len() int {\n"
            "\treturn 1\n"
            "}\n"
            "\n"
            "func Map[T any, U any](xs []T, f func(T) U) []U {\n"
            "\treturn nil\n"
            "}\n"
        )
        by = _by_kind(_rows("go", "t.go", src))
        # methods resolve their parent through the [K, V] receiver list
        meths = {r[2]: (r[3], r[7]) for r in by["function"]}
        assert meths["Get"] == ("Pair", True)
        assert meths["Len"] == ("Pair", True)
        assert meths["Map"] == (None, False)
        params = {(r[3], r[2]): r[11] for r in by["param"] if not r[12]}
        assert params[("Get", "k")] == "K"
        assert params[("Map", "xs")] == "[]T"
        assert params[("Map", "f")] == "func(T) U"
        rets = {r[3]: r[11] for r in by["param"] if r[12]}
        assert rets["Get"] == "V" and rets["Map"] == "[]U"
