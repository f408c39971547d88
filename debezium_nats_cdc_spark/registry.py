"""Versioned event-schema registry + contract tests (SURVEY §2 missing
item; reference docs/design.md:873-876 — "Define event schemas /
Validate against schema registry / Test consumer compatibility").

The reference specs the shape but ships no registry.  This is the
engine-side abstraction: every domain event type registers its payload
schema; producers are contract-tested against the latest version
(tests/test_schema_registry.py runs every rule's output through
``validate_events``); evolution is gated by a compatibility check.

Compatibility policy: FULL (both backward and forward) — a new version
may only ADD OPTIONAL fields.  That is deliberately the same rule
``schemas.evolve_table_schema`` enforces for source tables: any consumer
pinned to any version can read events produced under any other version
(missing optional fields read as NULL; unknown fields are ignored).
Field removal or a type change requires a new subject, not a new
version — the registry refuses it.

Validation stays JVM-side: payload JSON parses once with the version's
struct schema (``from_json``); a row is invalid when the JSON is
unparseable or a required field is null after the parse (which also
catches a mistyped required field — Spark yields null for a JSON value
that does not coerce to the declared type).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F, types as T

_TYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
}


@dataclass(frozen=True)
class FieldSpec:
    name: str
    dtype: str  # 'string' | 'long' | 'double' | 'boolean'
    required: bool = False

    def __post_init__(self):
        if self.dtype not in _TYPES:
            raise ValueError(f"unknown dtype {self.dtype!r} for {self.name!r}")


@dataclass(frozen=True)
class EventSchema:
    subject: str
    version: int
    fields: tuple[FieldSpec, ...]

    def spark_schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(f.name, _TYPES[f.dtype], True) for f in self.fields]
        )


def compatibility_violations(old: EventSchema,
                             new_fields: tuple[FieldSpec, ...]) -> list[str]:
    """FULL-compatibility check: the new version must keep every old
    field at its exact (dtype, required) contract and may only append
    OPTIONAL fields.  Returns human-readable violations (empty = ok)."""
    errs: list[str] = []
    old_by_name = {f.name: f for f in old.fields}
    new_by_name = {f.name: f for f in new_fields}
    for name, f in old_by_name.items():
        nf = new_by_name.get(name)
        if nf is None:
            errs.append(f"field {name!r} removed (breaks pinned consumers)")
        elif nf.dtype != f.dtype:
            errs.append(
                f"field {name!r} type changed {f.dtype} -> {nf.dtype}"
            )
        elif nf.required != f.required:
            errs.append(f"field {name!r} required flag changed")
    for name, nf in new_by_name.items():
        if name not in old_by_name and nf.required:
            errs.append(
                f"new field {name!r} is required (old producers break)"
            )
    return errs


class SchemaRegistry:
    """In-memory versioned registry (the cluster analog holds the same
    map in a compacted topic or a database; the CONTRACT — versioning +
    compatibility gate + validation — is what this class pins down)."""

    def __init__(self) -> None:
        self._subjects: dict[str, list[EventSchema]] = {}
        # built-Column cache for the per-batch hot path: constructing the
        # contract CASE chain costs hundreds of py4j round trips, and
        # foreachBatch would otherwise rebuild it every micro-batch
        # (measured 0.3-0.6 s/batch — BENCHLOG r6).  Columns are
        # immutable and DataFrame-independent, so they key on the active
        # SparkContext id; register() invalidates on any schema change.
        self._expr_cache: dict[tuple, object] = {}

    def _cached(self, kind: str, build):
        from .speccache import context_token

        key = (kind, context_token())
        if key not in self._expr_cache:
            stale = [k for k in self._expr_cache if k[1] != key[1]]
            for k in stale:
                del self._expr_cache[k]
            self._expr_cache[key] = build()
        return self._expr_cache[key]

    def subjects(self) -> list[str]:
        return sorted(self._subjects)

    def register(self, subject: str, fields: list[FieldSpec]) -> int:
        """Register a schema version; returns the version number.
        Re-registering an identical latest schema is idempotent."""
        fs = tuple(fields)
        history = self._subjects.setdefault(subject, [])
        if history:
            if history[-1].fields == fs:
                return history[-1].version
            errs = compatibility_violations(history[-1], fs)
            if errs:
                raise ValueError(
                    f"incompatible schema for {subject!r} v{len(history) + 1}: "
                    + "; ".join(errs)
                )
        schema = EventSchema(subject, len(history) + 1, fs)
        history.append(schema)
        self._expr_cache.clear()  # contract changed: rebuild hot-path exprs
        return schema.version

    def get(self, subject: str, version: int | None = None) -> EventSchema:
        history = self._subjects[subject]
        return history[-1] if version is None else history[version - 1]

    def _subject_violation(self, schema: EventSchema):
        """NULL-when-valid violation string for one subject's contract,
        prefixed with the contract version the payload was judged
        against: ``schema:<subject>:v<N>:<field,...>``."""
        parsed = F.from_json("payload", schema.spark_schema())
        # PERMISSIVE from_json gives an all-null STRUCT for malformed
        # JSON (not a null struct); the map-typed parse does yield NULL
        # for corrupt records, so it is the parseability probe
        bad_parse = F.from_json("payload", "map<string,string>").isNull()
        missing = [
            F.when(parsed[f.name].isNull(), F.lit(f.name))
            for f in schema.fields if f.required
        ]
        viol = F.concat_ws(
            ",", F.when(bad_parse, F.lit("unparseable_payload")), *missing
        )
        return F.when(
            viol != "",
            F.concat(F.lit(f"schema:{schema.subject}:v{schema.version}:"),
                     viol),
        )

    def _required_union_schema(self) -> T.StructType | None:
        """Union struct over every latest contract's REQUIRED fields, or
        None when two subjects declare the same field name at different
        dtypes (the merged single-parse below would then be ambiguous)."""
        seen: dict[str, str] = {}
        for subject in self.subjects():
            for f in self.get(subject).fields:
                if not f.required:
                    continue
                if seen.get(f.name, f.dtype) != f.dtype:
                    return None
                seen[f.name] = f.dtype
        return T.StructType(
            [T.StructField(n, _TYPES[d], True) for n, d in sorted(seen.items())]
        )

    def _violation_case_chain(self, parsed, bad_parse):
        """CASE chain over eventType: the versioned reason string when
        ``parsed``'s required fields for that subject are NULL (or
        ``bad_parse``), else NULL.  ``parsed``/``bad_parse`` may be raw
        from_json expressions OR materialized attribute references —
        the reason strings are identical either way."""
        expr = None
        for subject in self.subjects():
            schema = self.get(subject)
            missing = [
                F.when(parsed[f.name].isNull(), F.lit(f.name))
                for f in schema.fields if f.required
            ]
            viol = F.concat_ws(
                ",", F.when(bad_parse, F.lit("unparseable_payload")), *missing
            )
            tagged = F.when(
                viol != "",
                F.concat(F.lit(f"schema:{schema.subject}:v{schema.version}:"),
                         viol),
            )
            cond = F.col("eventType") == subject
            expr = (F.when(cond, tagged) if expr is None
                    else expr.when(cond, tagged))
        return expr

    def violation_expr(self):
        """One Column over a domain-event DataFrame (eventType + payload
        JSON): NULL when the payload satisfies the latest registered
        contract for its eventType (or the type has no contract), else
        the versioned reason string.

        Shape matters on the micro-batch hot path: foreachBatch
        re-analyzes its plan EVERY batch, so expression size is a
        per-batch latency tax (measured ~+0.3 s P50 for the naive
        per-subject form).  Fast path: ONE from_json against the union
        of all required fields + ONE parseability probe, then a CASE
        chain of cheap null-checks per subject — same reason strings,
        ~5× fewer expression nodes.  Falls back to per-subject parses
        only if two contracts ever declare one field name at different
        dtypes (identical semantics, bigger plan).

        NOTE for hot paths: this single-Column form re-evaluates the
        from_json subtrees per reference (codegen cannot hoist a
        subexpression that only some WHEN branches evaluate) — prefer
        ``contract_check`` inside foreachBatch, which materializes the
        parse once per row as attributes (measured: the events sink's
        validation stage dropped ~5×, BENCHLOG r6)."""
        subjects = self.subjects()
        if not subjects:
            return F.lit(None).cast("string")
        merged = self._required_union_schema()
        if merged is None:  # dtype conflict across subjects: general form
            expr = None
            for subject in subjects:
                tagged = self._subject_violation(self.get(subject))
                cond = F.col("eventType") == subject
                expr = (F.when(cond, tagged) if expr is None
                        else expr.when(cond, tagged))
            return expr
        parsed = F.from_json("payload", merged)
        bad_parse = F.from_json("payload", "map<string,string>").isNull()
        return self._violation_case_chain(parsed, bad_parse)

    # helper columns contract_check stamps (and with_validation drops)
    HELPER_COLS = ("_contract_parsed", "_contract_bad")

    def contract_check(self, events: DataFrame):
        """Hot-path form of ``violation_expr``: returns
        ``(events', reason_col, helper_cols)`` where ``events'`` carries
        the union-schema parse and the parseability probe as MATERIALIZED
        columns and ``reason_col`` references them as attributes.

        Why: the single-expression form references the from_json subtree
        once per (subject × required field) — ~70 JSON parses per row
        with the default 14-subject registry, and whole-stage codegen's
        subexpression elimination cannot hoist them because each sits
        inside a conditionally-evaluated WHEN branch.  Materializing the
        parse as an attribute makes every reference a struct-field read
        (Catalyst's CollapseProject keeps the barrier: it never inlines
        a non-cheap alias referenced more than once).  Measured on a
        1k-row batch: rules+validate+persist 1.66 s -> 0.27 s
        (BENCHLOG r6).  The caller must drop ``helper_cols`` after
        computing its derived columns."""
        subjects = self.subjects()
        if not subjects:
            return events, F.lit(None).cast("string"), []
        merged = self._required_union_schema()
        if merged is None:  # dtype conflict: rare general form, no helpers
            return events, self.violation_expr(), []
        parsed_c, bad_c = self.HELPER_COLS

        def build():
            return (
                {
                    parsed_c: F.from_json("payload", merged),
                    bad_c: F.from_json("payload",
                                       "map<string,string>").isNull(),
                },
                self._violation_case_chain(F.col(parsed_c), F.col(bad_c)),
            )

        helpers, reason = self._cached("contract_check", build)
        return events.withColumns(helpers), reason, list(self.HELPER_COLS)

    def version_expr(self):
        """Latest registered contract version per eventType (NULL for
        uncontracted types) — the stamp the DLQ rows carry so an
        incompatible producer is attributable to the exact contract
        version it failed."""

        def build():
            expr = None
            for subject in self.subjects():
                ver = F.lit(self.get(subject).version)
                cond = F.col("eventType") == subject
                expr = (F.when(cond, ver) if expr is None
                        else expr.when(cond, ver))
            return (F.lit(None).cast("int") if expr is None
                    else expr.cast("int"))

        return self._cached("version_expr", build)

    def validate_events(self, events: DataFrame, subject: str,
                        version: int | None = None) -> tuple[DataFrame, DataFrame]:
        """Split a domain-event DataFrame (rules.py envelope: eventType +
        payload JSON) into (valid, invalid) under ``subject``'s schema.
        Invalid rows carry ``contract_violation``.  One from_json pass —
        no Python in the path."""
        schema = self.get(subject, version)
        sdf = events.filter(F.col("eventType") == subject).withColumn(
            "_parsed", F.from_json("payload", schema.spark_schema())
        )
        required = [f.name for f in schema.fields if f.required]
        # PERMISSIVE from_json gives an all-null STRUCT for malformed
        # JSON (not a null struct); the map-typed parse does yield NULL
        # for corrupt records, so it is the parseability probe
        bad_parse = F.from_json("payload", "map<string,string>").isNull()
        missing = [
            F.when(F.col(f"_parsed.{n}").isNull(), F.lit(n)) for n in required
        ]
        violations = F.concat_ws(
            ",",
            F.when(bad_parse, F.lit("unparseable_payload")),
            *missing,
        )
        tagged = sdf.withColumn("contract_violation", violations)
        ok = F.col("contract_violation") == ""
        return (
            tagged.filter(ok).drop("_parsed", "contract_violation"),
            tagged.filter(~ok).drop("_parsed"),
        )


def default_registry() -> SchemaRegistry:
    """Registry pre-seeded with v1 payload contracts for every rule in
    operators/rules.py (field lists mirror each rule's _emp_payload
    projection — the contract test asserts they stay in lockstep)."""
    r = SchemaRegistry()
    s, l_, d = "string", "long", "double"

    def reg(subject, *specs):
        r.register(subject, [FieldSpec(*sp) for sp in specs])

    reg("EmployeeHired", ("employeeNumber", s, True), ("fullName", s),
        ("positionId", s), ("departmentId", l_), ("salary", d, True),
        ("hireDate", s))
    reg("EmployeePromoted", ("previousPositionId", s), ("newPositionId", s),
        ("previousSalary", d, True), ("newSalary", d, True),
        ("salaryIncrease", d))
    reg("EmployeeTerminated", ("employeeNumber", s, True), ("tenureDays", l_))
    reg("EmployeeTransferred", ("fromDepartmentId", l_), ("toDepartmentId", l_))
    reg("ManagerAssigned", ("previousManagerId", l_), ("newManagerId", l_))
    reg("EmployeeDataUpdated", ("employeeNumber", s, True))
    reg("DepartmentCreated", ("name", s, True))
    reg("DepartmentRestructured", ("previousParentId", l_), ("newParentId", l_))
    reg("SalaryAdjusted", ("oldSalary", d), ("newSalary", d, True),
        ("reason", s), ("effectiveDate", s))
    reg("LeaveRequested", ("leaveType", s, True), ("startDate", s, True),
        ("endDate", s))
    reg("LeaveApproved", ("leaveType", s), ("approvedBy", l_))
    reg("AttendanceMarked", ("attendanceDate", s, True), ("status", s))
    reg("BonusAwarded", ("amount", d, True), ("bonusType", s),
        ("awardDate", s))
    reg("StockGranted", ("shares", l_, True), ("grantDate", s),
        ("vestingMonths", l_), ("cliffMonths", l_))
    return r
