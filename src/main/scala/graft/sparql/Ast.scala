package graft.sparql

/** Algebra for the SPARQL 1.1 fragment supported by the reference engine
  * (StreamIntelligenceLab/Kolibrie): SELECT + six Update forms, GRAPH /
  * UNION / VALUES / BIND / FILTER / subqueries, SUM/MIN/MAX/AVG/COUNT
  * aggregates, RDF-star quoted triples, RSP-QL window blocks.
  *
  * Mirrors the shape of the reference AST (`shared/src/query.rs:104-424`,
  * `shared/src/terms.rs:14-23`) but is an independent design: terms carry
  * lexical forms (no u32 dictionary — see graft.model.TermLex for the
  * storage-level conventions).
  */
object Ast {

  // ---- terms -------------------------------------------------------------
  sealed trait Term
  final case class Var(name: String) extends Term
  /** IRI, stored without angle brackets (reference strips them when
    * interning: `kolibrie/src/sparql_database.rs:1628-1656`). */
  final case class Iri(value: String) extends Term
  /** Literal: datatype suffix stripped, language tag kept appended to the
    * lexical form — the reference's dictionary-cleaning policy
    * (`sparql_database.rs:1628-1656`). */
  final case class Lit(value: String) extends Term
  /** RDF-star quoted triple pattern `<< s p o >>`; nestable
    * (`shared/src/quoted_triple_store.rs:17-57`). */
  final case class Quoted(s: Term, p: Term, o: Term) extends Term
  /** Blank node `_:label`. In update templates each solution allocates a
    * fresh node per label, shared within the solution
    * (`execute_query.rs:610-627`). */
  final case class BNode(label: String) extends Term

  final case class TriplePattern(s: Term, p: Term, o: Term)

  // ---- property paths (EXTENSION — the reference has none, SURVEY §7.5;
  // SPARQL 1.1 §9 syntax: iri, ^inverse, seq/seq, alt|alt, +, *, ?) ------
  sealed trait Path
  final case class PLink(iri: String) extends Path
  final case class PInv(p: Path) extends Path
  final case class PSeq(l: Path, r: Path) extends Path
  final case class PAlt(l: Path, r: Path) extends Path
  final case class POneOrMore(p: Path) extends Path
  final case class PZeroOrMore(p: Path) extends Path
  final case class PZeroOrOne(p: Path) extends Path
  /** Negated property set `!iri` / `!(iri1|^iri2|…)` (SPARQL 1.1 §9.1
    * PathNegatedPropertySet): forward edges whose predicate is NOT in
    * `fwd`, unioned with REVERSED edges whose predicate is not in `inv`
    * (each side only when its member list is non-empty, per §9.3). */
  final case class PNeg(fwd: Seq[String], inv: Seq[String]) extends Path

  // ---- graph scope (`shared/src/dataset_index.rs:41-54`) -----------------
  sealed trait GraphSpec
  case object DefaultGraph extends GraphSpec
  final case class GraphIri(iri: String) extends GraphSpec
  final case class GraphVar(name: String) extends GraphSpec

  // ---- expressions (FILTER / BIND) ---------------------------------------
  sealed trait Expr
  final case class ETerm(t: Term) extends Expr
  /** `+ - * /` over numeric-parsed operands (`shared/src/query.rs:24-58`). */
  final case class Arith(op: String, l: Expr, r: Expr) extends Expr
  /** CONCAT / TRIPLE / SUBJECT / PREDICATE / OBJECT / isTRIPLE / registered
    * UDFs (`engine.rs:437-573`). EXTENSION: the SPARQL 1.1 built-in
    * library (STR/STRLEN/UCASE/LCASE/SUBSTR/STRBEFORE/STRAFTER/REPLACE/
    * CONTAINS/STRSTARTS/STRENDS/ABS/CEIL/FLOOR/ROUND/COALESCE) — absent
    * from the reference fragment, compiled to codegen'd Catalyst
    * functions. */
  final case class Func(name: String, args: Seq[Expr]) extends Expr
  /** `IF(cond, then, else)` — EXTENSION (SPARQL 1.1 §17.4.1.2); the
    * condition reuses FILTER's numeric-else-lexical comparison
    * semantics. */
  final case class IfExpr(c: Condition, t: Expr, e: Expr) extends Expr

  sealed trait Condition
  /** op ∈ = != > >= < <= ; numeric-if-both-parse else lexical
    * (`streamertail_optimizer/types.rs:349-371`). */
  final case class Cmp(op: String, l: Expr, r: Expr) extends Condition
  final case class And(l: Condition, r: Condition) extends Condition
  final case class Or(l: Condition, r: Condition) extends Condition
  final case class Not(c: Condition) extends Condition
  /** Boolean function in FILTER position; reference supports isTRIPLE only
    * (`types.rs:444-456`). */
  final case class CondFunc(name: String, args: Seq[Expr]) extends Condition
  /** `FILTER [NOT] EXISTS { … }` — a Spark-side EXTENSION (the reference
    * fragment has none — SURVEY §7.5); compiles to a compatibility
    * semi/anti join, the natural Spark shape (`left_semi`/`left_anti`).
    * Supported only as the entire FILTER condition (not nested under
    * `&&`/`||`/`!`), which keeps it a join instead of a per-row subquery. */
  final case class ExistsCond(elems: Seq[Element], negated: Boolean) extends Condition

  // ---- group graph pattern elements --------------------------------------
  sealed trait Element
  final case class Bgp(patterns: Seq[TriplePattern]) extends Element
  final case class GraphBlock(graph: GraphSpec, elems: Seq[Element]) extends Element
  /** n-ary UNION; duplicates retained, branch schemas may differ
    * (`operators/logical.rs:25-27`, README.md:277-307). */
  final case class UnionBlock(branches: Seq[Seq[Element]]) extends Element
  /** FILTERs are scoped to the end of the enclosing group
    * (`utils.rs:443-453`). */
  final case class FilterElem(cond: Condition) extends Element
  final case class BindElem(expr: Expr, v: String) extends Element
  /** VALUES with UNDEF → None (`engine.rs:155-167`). */
  final case class ValuesElem(vars: Seq[String], rows: Seq[Seq[Option[Term]]]) extends Element
  final case class SubSelect(query: Select) extends Element
  /** `OPTIONAL { … }` — EXTENSION beyond the reference fragment (it has no
    * OPTIONAL — verified r1, SURVEY §7.5): SPARQL left join, compiled to a
    * left-preserving compatibility join. FILTERs inside the block scope
    * over the optional group only. */
  final case class OptionalBlock(elems: Seq[Element]) extends Element
  /** `MINUS { … }` — EXTENSION: removes solutions compatible with some
    * right solution sharing at least one both-bound variable (disjoint
    * domains keep the row, per SPARQL 1.1 §8.3); a `left_anti` join. */
  final case class MinusBlock(elems: Seq[Element]) extends Element
  /** Triple pattern whose predicate is a property [[Path]] (EXTENSION):
    * `?s <p>/<q>+ ?o`. Transitive forms compile to the recursive-doubling
    * closure the reasoner uses (O(log diameter) join rounds). */
  final case class PathPattern(s: Term, path: Path, o: Term) extends Element
  /** RSP-QL `WINDOW :w { … }` block (`parser.rs:249-282`). */
  final case class WindowBlockElem(windowIri: String, elems: Seq[Element]) extends Element

  // ---- solution modifiers -------------------------------------------------
  /** func ∈ SUM MIN MAX AVG COUNT; COUNT(*) → v=None. The reference parser
    * misses COUNT (`parser.rs:1629-1661`) but the executor and README
    * support it — we support it (SURVEY §7.5). EXTENSIONS: GROUP_CONCAT
    * (with `sep`, deterministic sorted order) and SAMPLE (deterministic
    * min — SPARQL allows any value, we pick a reproducible one). */
  final case class Aggregate(func: String, v: Option[String], alias: String,
      sep: Option[String] = None, distinct: Boolean = false)
  final case class OrderKey(v: String, asc: Boolean)

  final case class Select(
      distinct: Boolean,
      projection: Seq[String],          // bare projected variables
      aggregates: Seq[Aggregate],       // (expr AS ?alias) projections
      where: Seq[Element],
      groupBy: Seq[String],
      orderBy: Seq[OrderKey],
      limit: Option[Int],
      offset: Option[Int],
      fromGraphs: Seq[String],          // FROM <g> (merged default graph)
      fromNamed: Seq[String],           // FROM NAMED <g>
      /** `HAVING (constraint)…` — EXTENSION (SPARQL 1.1 §11.3): filters
        * grouped solutions. Constraints may reference aggregate
        * applications (`SUM(?x) > 10`) — compiled by matching an existing
        * projected aggregate or adding a synthetic one dropped after the
        * filter — or grouped-variable / aggregate-alias atoms. */
      having: Seq[Condition] = Nil)

  // ---- SPARQL Update (`shared/src/query.rs:377-402`) ---------------------
  sealed trait Update
  final case class InsertData(quads: Seq[(TriplePattern, GraphSpec)]) extends Update
  final case class DeleteData(quads: Seq[(TriplePattern, GraphSpec)]) extends Update
  /** DELETE/INSERT … WHERE: WHERE evaluated once pre-mutation, deletes
    * applied before inserts (`execute_query.rs:578-592,867-884`).
    * DELETE WHERE = delete template == where patterns. */
  final case class Modify(
      deleteTemplate: Seq[(TriplePattern, GraphSpec)],
      insertTemplate: Seq[(TriplePattern, GraphSpec)],
      where: Seq[Element]) extends Update

  sealed trait Operation
  final case class SelectOp(q: Select) extends Operation
  final case class UpdateOp(u: Update) extends Operation
  /** `ASK [FROM …] { … }` — EXTENSION beyond the reference fragment (no
    * ASK there, SURVEY §7.5): boolean solution-existence test. Wraps a
    * Select whose WHERE is the probed group. */
  final case class AskOp(q: Select) extends Operation
  /** `CONSTRUCT { template } [FROM …] WHERE { … }` — EXTENSION: instantiate
    * the template once per solution, drop rows with unbound positions,
    * set semantics (SPARQL 1.1 §16.2). Template blank nodes allocate fresh
    * per solution, as update templates do (`execute_query.rs:610-627`). */
  final case class ConstructOp(template: Seq[TriplePattern], q: Select) extends Operation
  /** `DESCRIBE ?v… <iri>… [WHERE { … }]` — EXTENSION (SPARQL 1.1 §16.4
    * leaves the result form implementation-defined): we emit every
    * default-graph triple whose SUBJECT is a described resource —
    * resources = the listed IRIs plus the distinct bindings of the listed
    * variables. The WHERE-less form describes the IRIs directly. */
  final case class DescribeOp(vars: Seq[String], iris: Seq[String], q: Select)
      extends Operation

  /** `PROB(provenance=…, threshold=…, …)` rule annotation
    * (`kolibrie/src/parser.rs:2846-3100`). `thresholdPolicy` is
    * "explicit" or "auto:cost" (threshold derived as fp/(fp+fn)).
    * The hybrid knobs mirror `HybridConfig` defaults
    * (`shared/src/hybrid.rs:675-693`). */
  final case class ProbAnnotation(
      provenance: String,
      threshold: Option[Double],
      thresholdPolicy: String = "explicit",
      confidence: Option[Double] = None,
      bandEpsilon: Double = 0.02,
      marginalGainFloor: Double = 1e-4,
      kInitial: Int = 8,
      kMax: Int = 64,
      kGrowth: Int = 2,
      topkBudgetMs: Long = 25L,
      sddBudgetMs: Long = 250L,
      sddNodeBudget: Int = 100000)

  /** Datalog-style rule: `RULE :name :- CONSTRUCT { … } WHERE { … }`
    * (`shared/src/rule.rs:21-29`, `parser.rs:3101-3177`); optionally
    * carries a PROB annotation (`parser.rs:3099-3100`). */
  final case class Rule(
      name: String,
      premise: Seq[TriplePattern],
      negativePremise: Seq[TriplePattern],
      filters: Seq[Condition],
      conclusion: Seq[TriplePattern],
      prob: Option[ProbAnnotation] = None)

  /** `TRAIN NEURAL RELATION <pred> { DATA{…}|QUERY{…} LABEL … TARGET {…}
    * LOSS … OPTIMIZER … LEARNING_RATE … EPOCHS … BATCH_SIZE … [SAVE_TO …] }`
    * (`kolibrie/src/parser.rs:2391-2503`). `dataSource` carries the raw
    * block text: Left = a full SELECT (QUERY form), Right = graph
    * patterns to be wrapped into a SELECT over the relation's variables
    * (the reference's `build_select_query`, `neural_relations.rs:173-196`). */
  final case class TrainNeuralRelationDecl(
      predicate: String,
      dataSource: Either[String, String],
      labelVar: String,
      targetTriple: TriplePattern,
      loss: String,
      optimizer: String,
      learningRate: Double,
      epochs: Int,
      batchSize: Int,
      savePath: Option[String])

  /** RSP-QL window spec `[RANGE w STEP s]`, milliseconds
    * (`rsp/s2r.rs:175-330`, `parser.rs:2594-2643`). */
  /** One `FROM NAMED WINDOW` clause. `report`/`tick` carry the raw parsed
    * strategy keywords (`parser.rs:2644-2661` parses REPORT ON_WINDOW_CLOSE/
    * ON_CONTENT_CHANGE/NON_EMPTY_CONTENT/PERIODIC and TICK TIME_DRIVEN/
    * TUPLE_DRIVEN/BATCH_DRIVEN inside the window bracket); lowering to
    * engine strategies happens in [[graft.streaming.RspEngineBuilder]]. */
  final case class WindowSpec(iri: String, streamIri: String, rangeMs: Long, stepMs: Long,
      report: Option[String] = None, tick: Option[String] = None)

  sealed trait R2SKind
  case object RStream extends R2SKind
  case object IStream extends R2SKind
  case object DStream extends R2SKind

  /** Parsed `WITH POLICY` spec on a window clause
    * (`parser.rs:2705-2775`): `steal`, `wait`, or
    * `(timeout=<dur>, fallback=steal|drop)`. */
  sealed trait SyncPolicySpec
  case object WaitPolicy extends SyncPolicySpec
  case object StealPolicy extends SyncPolicySpec
  final case class TimeoutPolicy(ms: Long, fallbackSteal: Boolean) extends SyncPolicySpec

  /** REGISTER R/I/DSTREAM <out> AS SELECT … (`parser.rs:2795-2846`).
    * `policy` is the last `WITH POLICY` across the window clauses (the
    * engine coordinates with one policy, as the reference's does). */
  final case class RspQuery(
      kind: R2SKind,
      outIri: String,
      windows: Seq[WindowSpec],
      select: Select,
      policy: Option[SyncPolicySpec] = None)

  /** `RETRIEVE SOME|EVERY LATENT|ACTIVE STREAM ?v FROM <iri> WITH { … }`
    * (`parser.rs:3179-3263`). Executed by
    * [[graft.sparql.Compiler.executeRetrieve]] with the semantics of the
    * reference's `process_retrieve_clause` (`parser.rs:3965-4010`): a
    * per-pattern default-graph triple matcher; mode/state/variable/IRI
    * are descriptive metadata there (printed, not consulted). */
  final case class RetrieveClause(
      mode: String,       // "SOME" | "EVERY"
      state: String,      // "LATENT" | "ACTIVE"
      variable: String,
      fromIri: String,
      pattern: Seq[TriplePattern])
}
