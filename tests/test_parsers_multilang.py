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
