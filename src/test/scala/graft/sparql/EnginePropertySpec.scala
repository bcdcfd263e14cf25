package graft.sparql

import graft.SparkTestBase
import graft.algebra.Algebra._
import graft.exec.SparqlExecutor
import graft.graph.TriplesGraph
import graft.rdf.{Iri, Lit, Term, Xsd}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based cross-check (SURVEY §5 test plan): random BGPs + filters
  * over random small graphs, engine results compared against a naive
  * in-memory unification evaluator. Catches join-order, duplicate-handling
  * and type-coercion bugs that fixed goldens cannot. */
class EnginePropertySpec extends SparkTestBase {

  private val ex = "http://x#"
  private val subjects = (0 until 5).map(i => s"${ex}s$i")
  private val numPreds = Seq(s"${ex}p0", s"${ex}p1")
  private val iriPred = s"${ex}p2"

  private type G = Seq[(String, String, Any)] // (s, p, Long | String-iri)

  private val genTriple: Gen[(String, String, Any)] = for {
    s <- Gen.oneOf(subjects)
    p <- Gen.oneOf(numPreds :+ iriPred)
    o <- if (p == iriPred) Gen.oneOf(subjects) else Gen.choose(0L, 9L)
  } yield (s, p, o)

  private val genGraph: Gen[G] =
    Gen.chooseNum(2, 14).flatMap(n => Gen.listOfN(n, genTriple)).map(_.distinct)

  // variables partitioned by type so unification never crosses types:
  // a/b/c bind IRIs, x/y bind numbers
  private case class TP(s: Either[String, String], p: String, o: Either[String, Any])
  // Left = var name, Right = constant

  private val iriVars = Seq("a", "b", "c")
  private val numVars = Seq("x", "y")

  private val genPattern: Gen[TP] = for {
    p <- Gen.oneOf(numPreds :+ iriPred)
    s <- Gen.oneOf(iriVars.map(Left(_): Either[String, String]) ++
      subjects.map(Right(_): Either[String, String]))
    o <- if (p == iriPred)
      Gen.oneOf(iriVars.map(Left(_): Either[String, Any]) ++
        subjects.map(v => Right(v): Either[String, Any]))
    else
      Gen.oneOf(numVars.map(Left(_): Either[String, Any]) ++
        (0L to 9L).map(v => Right(v): Either[String, Any]))
  } yield TP(s, p, o)

  private val genBgp: Gen[List[TP]] = Gen.chooseNum(1, 3).flatMap(Gen.listOfN(_, genPattern))

  private val genFilter: Gen[Option[(String, String, Long)]] = Gen.option(for {
    v <- Gen.oneOf(numVars)
    op <- Gen.oneOf("<", "<=", ">", ">=", "=", "!=")
    c <- Gen.choose(0L, 9L)
  } yield (v, op, c))

  private def naive(g: G, bgp: List[TP], filt: Option[(String, String, Long)])
    : Seq[Map[String, Any]] = {
    def matchTriple(tp: TP, t: (String, String, Any), b: Map[String, Any])
      : Option[Map[String, Any]] = {
      if (t._2 != tp.p) return None
      val b1 = tp.s match {
        case Right(c) => if (t._1 == c) Some(b) else None
        case Left(v) => b.get(v) match {
          case Some(x) => if (x == t._1) Some(b) else None
          case None => Some(b + (v -> t._1))
        }
      }
      b1.flatMap { bb =>
        tp.o match {
          case Right(c) => if (t._3 == c) Some(bb) else None
          case Left(v) => bb.get(v) match {
            case Some(x) => if (x == t._3) Some(bb) else None
            case None => Some(bb + (v -> t._3))
          }
        }
      }
    }
    var sols: Seq[Map[String, Any]] = Seq(Map.empty)
    bgp.foreach { tp =>
      sols = sols.flatMap(b => g.flatMap(t => matchTriple(tp, t, b)))
    }
    filt match {
      case Some((v, op, c)) => sols.filter { b =>
        b.get(v) match {
          case Some(x: Long) => op match {
            case "<" => x < c; case "<=" => x <= c; case ">" => x > c
            case ">=" => x >= c; case "=" => x == c; case _ => x != c
          }
          case _ => false // unbound var in filter -> SPARQL error -> row dropped
        }
      }
      case None => sols
    }
  }

  test("random BGP+filter agrees with a naive unification evaluator") {
    val prop = Prop.forAll(genGraph, genBgp, genFilter) { (g, bgp, filt) =>
      val vars = bgp.flatMap(tp =>
        Seq(tp.s.left.toOption, tp.o.left.toOption).flatten).distinct
      val filtOk = filt.forall(f => vars.contains(f._1))
      if (g.isEmpty || vars.isEmpty || !filtOk) Prop.undecided
      else {
        val terms: Seq[(Term, String, Term)] = g.map {
          case (s, p, o: Long) => (Iri(s), p, Lit(o.toString, Xsd.integer))
          case (s, p, o) => (Iri(s), p, Iri(o.toString))
        }
        val graph = TriplesGraph.fromTerms(spark, terms)
        val triples = bgp.map { tp =>
          val sv = tp.s.fold(V(_), c => T(Iri(c)))
          val ov = tp.o.fold(V(_), {
            case c: Long => T(Lit(c.toString, Xsd.integer))
            case c => T(Iri(c.toString))
          })
          TriplePattern(sv, PLink(tp.p), ov)
        }
        val base: Pattern = Bgp(triples)
        val where = filt match {
          case Some((v, op, c)) =>
            Filter(ECmp(op, EVar(v), ETerm(Lit(c.toString, Xsd.integer))), base)
          case None => base
        }
        val q = SelectQuery(vars.map(ProjItem(_, None)), distinct = false,
          reduced = false, where, Nil, None, Nil, None, None)
        val got = new SparqlExecutor(graph).execute(q).collect().toSeq
          .map(r => vars.indices.map(i => String.valueOf(r.get(i))).mkString("|"))
          .sorted
        val exp = naive(g, bgp, filt)
          .map(b => vars.map(v => String.valueOf(b(v))).mkString("|")).sorted
        Prop(got == exp) :| s"got=$got exp=$exp graph=$g bgp=$bgp filt=$filt"
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25).withMaxDiscardRatio(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("random GRAPH patterns agree with the naive evaluator on quad graphs") {
    // every triple randomly lands in the default graph (0) or one of two
    // named graphs; the query runs in default context, GRAPH <const>, or
    // GRAPH ?g — naive expectation evaluates the BGP against exactly the
    // triples of the relevant graph(s), binding ?g in the enumeration case
    val gs = Seq(s"${ex}g1", s"${ex}g2")
    val genQuads: Gen[List[((String, String, Any), Int)]] =
      Gen.chooseNum(2, 14).flatMap(n =>
        Gen.listOfN(n, genTriple.flatMap(t => Gen.choose(0, 2).map((t, _)))))
        .map(_.distinct)
    val prop = Prop.forAll(genQuads, genBgp, Gen.choose(0, 2), Gen.oneOf(0, 1)) {
      (qg, bgp, mode, which) =>
        val vars = bgp.flatMap(tp =>
          Seq(tp.s.left.toOption, tp.o.left.toOption).flatten).distinct
        if (qg.isEmpty || vars.isEmpty) Prop.undecided
        else {
          def strip(gi: Int): G = qg.collect { case (t, `gi`) => t }
          val expected: Seq[Map[String, Any]] = mode match {
            case 0 => naive(strip(0), bgp, None)
            case 1 => naive(strip(which + 1), bgp, None)
            case _ => (1 to 2).flatMap(gi =>
              naive(strip(gi), bgp, None).map(_ + ("g" -> gs(gi - 1))))
          }
          val quads: Seq[(Term, String, Term, Option[String])] = qg.map {
            case ((s, p, o: Long), gi) =>
              (Iri(s), p, Lit(o.toString, Xsd.integer),
                if (gi == 0) None else Some(gs(gi - 1)))
            case ((s, p, o), gi) =>
              (Iri(s), p, Iri(o.toString),
                if (gi == 0) None else Some(gs(gi - 1)))
          }
          val graph = TriplesGraph.fromQuads(spark, quads)
          val triples = bgp.map { tp =>
            val sv = tp.s.fold(V(_), c => T(Iri(c)))
            val ov = tp.o.fold(V(_), {
              case c: Long => T(Lit(c.toString, Xsd.integer))
              case c => T(Iri(c.toString))
            })
            TriplePattern(sv, PLink(tp.p), ov)
          }
          val base: Pattern = Bgp(triples)
          val (where, allVars) = mode match {
            case 0 => (base, vars)
            case 1 => (GraphPat(T(Iri(gs(which))), base), vars)
            case _ => (GraphPat(V("g"), base), vars :+ "g")
          }
          val q = SelectQuery(allVars.map(ProjItem(_, None)), distinct = false,
            reduced = false, where, Nil, None, Nil, None, None)
          val got = new SparqlExecutor(graph).execute(q).collect().toSeq
            .map(r => allVars.indices.map(i => String.valueOf(r.get(i))).mkString("|"))
            .sorted
          val exp = expected
            .map(b => allVars.map(v => String.valueOf(b(v))).mkString("|")).sorted
          Prop(got == exp) :| s"got=$got exp=$exp quads=$qg bgp=$bgp mode=$mode"
        }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25).withMaxDiscardRatio(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("random OPTIONAL patterns agree with naive left-join semantics") {
    def toTriples(bgp: List[TP]): Seq[TriplePattern] = bgp.map { tp =>
      val sv = tp.s.fold(V(_), c => T(Iri(c)))
      val ov = tp.o.fold(V(_), {
        case c: Long => T(Lit(c.toString, Xsd.integer))
        case c => T(Iri(c.toString))
      })
      TriplePattern(sv, PLink(tp.p), ov)
    }
    def compatible(a: Map[String, Any], b: Map[String, Any]): Boolean =
      a.keySet.intersect(b.keySet).forall(k => a(k) == b(k))
    val genSmall: Gen[List[TP]] = Gen.chooseNum(1, 2).flatMap(Gen.listOfN(_, genPattern))
    val prop = Prop.forAll(genGraph, genSmall, genSmall) { (g, req, opt) =>
      val reqVars = req.flatMap(tp => Seq(tp.s.left.toOption, tp.o.left.toOption).flatten).distinct
      val optVars = opt.flatMap(tp => Seq(tp.s.left.toOption, tp.o.left.toOption).flatten).distinct
      val vars = (reqVars ++ optVars).distinct
      if (g.isEmpty || reqVars.isEmpty || optVars.diff(reqVars).isEmpty) Prop.undecided
      else {
        val terms: Seq[(Term, String, Term)] = g.map {
          case (s, p, o: Long) => (Iri(s), p, Lit(o.toString, Xsd.integer))
          case (s, p, o) => (Iri(s), p, Iri(o.toString))
        }
        val graph = TriplesGraph.fromTerms(spark, terms)
        val q = SelectQuery(vars.map(ProjItem(_, None)), distinct = false,
          reduced = false,
          LeftJoin(Bgp(toTriples(req)), Bgp(toTriples(opt)), None),
          Nil, None, Nil, None, None)
        val got = new SparqlExecutor(graph).execute(q).collect().toSeq
          .map(r => vars.indices.map(i => String.valueOf(r.get(i))).mkString("|"))
          .sorted
        // SPARQL §8.3 LeftJoin: μ extended by every compatible ν, or μ alone
        val reqSols = naive(g, req, None)
        val optSols = naive(g, opt, None)
        val exp = reqSols.flatMap { mu =>
          val exts = optSols.filter(compatible(mu, _)).map(nu => mu ++ nu)
          if (exts.nonEmpty) exts else Seq(mu)
        }.map(b => vars.map(v => String.valueOf(b.getOrElse(v, null))).mkString("|"))
          .sorted
        Prop(got == exp) :| s"got=$got exp=$exp graph=$g req=$req opt=$opt"
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25).withMaxDiscardRatio(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("random MINUS and UNION patterns agree with the naive semantics") {
    def toTriples(bgp: List[TP]): Seq[TriplePattern] = bgp.map { tp =>
      val sv = tp.s.fold(V(_), c => T(Iri(c)))
      val ov = tp.o.fold(V(_), {
        case c: Long => T(Lit(c.toString, Xsd.integer))
        case c => T(Iri(c.toString))
      })
      TriplePattern(sv, PLink(tp.p), ov)
    }
    val genSmall: Gen[List[TP]] = Gen.chooseNum(1, 2).flatMap(Gen.listOfN(_, genPattern))
    val prop = Prop.forAll(genGraph, genSmall, genSmall, Gen.oneOf(true, false)) {
      (g, l, r, isMinus) =>
        val lVars = l.flatMap(tp => Seq(tp.s.left.toOption, tp.o.left.toOption).flatten).distinct
        val rVars = r.flatMap(tp => Seq(tp.s.left.toOption, tp.o.left.toOption).flatten).distinct
        if (g.isEmpty || lVars.isEmpty) Prop.undecided
        else {
          val terms: Seq[(Term, String, Term)] = g.map {
            case (s, p, o: Long) => (Iri(s), p, Lit(o.toString, Xsd.integer))
            case (s, p, o) => (Iri(s), p, Iri(o.toString))
          }
          val graph = TriplesGraph.fromTerms(spark, terms)
          val vars = if (isMinus) lVars else (lVars ++ rVars).distinct
          val where: Pattern =
            if (isMinus) Minus(Bgp(toTriples(l)), Bgp(toTriples(r)))
            else Union(Bgp(toTriples(l)), Bgp(toTriples(r)))
          val q = SelectQuery(vars.map(ProjItem(_, None)), distinct = false,
            reduced = false, where, Nil, None, Nil, None, None)
          val got = new SparqlExecutor(graph).execute(q).collect().toSeq
            .map(row => vars.indices.map(i => String.valueOf(row.get(i))).mkString("|"))
            .sorted
          val lSols = naive(g, l, None)
          val rSols = naive(g, r, None)
          val exp = (if (isMinus)
            // SPARQL §8.3.3: drop μ only if some ν is compatible AND shares
            // at least one variable (disjoint domains remove nothing)
            lSols.filterNot { mu =>
              rSols.exists { nu =>
                val shared = mu.keySet.intersect(nu.keySet)
                shared.nonEmpty && shared.forall(k => mu(k) == nu(k))
              }
            }
          else lSols ++ rSols) // UNION: bag concat, absent vars null
            .map(b => vars.map(v => String.valueOf(b.getOrElse(v, null))).mkString("|"))
            .sorted
          Prop(got == exp) :| s"minus=$isMinus got=$got exp=$exp graph=$g l=$l r=$r"
        }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25).withMaxDiscardRatio(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("random negated-property-set patterns agree with the naive evaluator") {
    val allPreds = numPreds :+ iriPred
    val genNps: Gen[(Seq[String], Either[String, String], Boolean)] = for {
      n <- Gen.chooseNum(1, 2)
      excl <- Gen.pick(n, allPreds)
      s <- Gen.oneOf(iriVars.take(1).map(Left(_): Either[String, String]) ++
        subjects.map(Right(_): Either[String, String]))
      inverse <- Gen.oneOf(false, true)
    } yield (excl.toSeq, s, inverse)

    val prop = Prop.forAll(genGraph, genNps) { case (g, (excl, s, inverse)) =>
      if (g.isEmpty) Prop.undecided
      else {
        val terms: Seq[(Term, String, Term)] = g.map {
          case (s0, p, o: Long) => (Iri(s0), p, Lit(o.toString, Xsd.integer))
          case (s0, p, o) => (Iri(s0), p, Iri(o.toString))
        }
        val graph = TriplesGraph.fromTerms(spark, terms)
        val sv = s.fold(V(_), c => T(Iri(c)))
        val nps =
          if (inverse) PNegatedPropSet(Nil, excl) else PNegatedPropSet(excl, Nil)
        val vars = s.left.toOption.toSeq :+ "o"
        val q = SelectQuery(vars.map(ProjItem(_, None)), distinct = false,
          reduced = false,
          Bgp(Seq(TriplePattern(sv, nps, V("o")))),
          Nil, None, Nil, None, None)
        val got = new SparqlExecutor(graph).execute(q).collect().toSeq
          .map(r => vars.indices.map(i => String.valueOf(r.get(i))).mkString("|"))
          .sorted
        // naive: forward matches (s,o) of triples with p ∉ excl; inverse
        // matches (s,o) iff (o, p, s) is a triple with p ∉ excl
        val kept = g.filterNot(t => excl.contains(t._2))
        val exp = kept.flatMap { t =>
          val (subjVal, objVal) = if (inverse) (t._3, t._1: Any) else (t._1: Any, t._3)
          s match {
            case Right(c) if String.valueOf(subjVal) != c => None
            case Right(_) => Some(Seq(String.valueOf(objVal)).mkString("|"))
            case Left(_) =>
              Some(Seq(String.valueOf(subjVal), String.valueOf(objVal)).mkString("|"))
          }
        }.sorted
        Prop(got == exp) :| s"got=$got exp=$exp graph=$g excl=$excl s=$s inv=$inverse"
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25).withMaxDiscardRatio(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("random ASK and CONSTRUCT agree with the naive evaluator") {
    val prop = Prop.forAll(genGraph, genBgp) { (g, bgp) =>
      val vars = bgp.flatMap(tp =>
        Seq(tp.s.left.toOption, tp.o.left.toOption).flatten).distinct
      if (g.isEmpty || vars.isEmpty) Prop.undecided
      else {
        val terms: Seq[(Term, String, Term)] = g.map {
          case (s, p, o: Long) => (Iri(s), p, Lit(o.toString, Xsd.integer))
          case (s, p, o) => (Iri(s), p, Iri(o.toString))
        }
        val graph = TriplesGraph.fromTerms(spark, terms)
        val triples = bgp.map { tp =>
          val sv = tp.s.fold(V(_), c => T(Iri(c)))
          val ov = tp.o.fold(V(_), {
            case c: Long => T(Lit(c.toString, Xsd.integer))
            case c => T(Iri(c.toString))
          })
          TriplePattern(sv, PLink(tp.p), ov)
        }
        val where: Pattern = Bgp(triples)
        val exec = new SparqlExecutor(graph)
        val expSols = naive(g, bgp, None)
        val askOk = exec.executeAsk(AskQuery(where)) == expSols.nonEmpty
        // CONSTRUCT a single template triple off the first bound variable;
        // expected = distinct instantiations over the naive solution set
        val v = vars.head
        val template = Seq(TriplePattern(
          T(Iri(s"${ex}out")), PLink(s"${ex}made"), V(v)))
        val got = exec.executeConstruct(ConstructQuery(template, where))
          .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
        val exp = expSols.map(b =>
          (s"${ex}out", s"${ex}made", String.valueOf(b(v)))).toSet
        Prop(askOk && got == exp) :|
          s"askOk=$askOk got=$got exp=$exp graph=$g bgp=$bgp"
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25).withMaxDiscardRatio(10), prop)
    assert(res.passed, res.status.toString)
  }
}
