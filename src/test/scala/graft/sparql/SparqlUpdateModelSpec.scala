package graft.sparql

import graft.SparkTestBase
import graft.exec.{SparqlExecutor, SparqlUpdate}
import graft.graph.TriplesGraph
import graft.rdf.{Iri, Lit, Term, Xsd}

/** Randomized model check for SPARQL Update: a scripted sequence of ground
  * INSERT DATA / DELETE DATA ops against the engine must match a plain
  * Scala Set[(s, p, o-lexical)] model applying RDF set semantics. Seeded —
  * failures replay exactly. Also: update a PERSISTED store round-trip
  * (load → update → save → reload) to pin the load/applyDelta interplay. */
class SparqlUpdateModelSpec extends SparkTestBase {

  private val ex = "http://example.net/ns#"

  test("scripted ground updates match the set-semantics model (seeded)") {
    val rnd = new scala.util.Random(42)
    val subjects = (0 until 6).map(i => s"s$i")
    val preds = Seq("name", "age", "tag")
    def randTriple(): (String, String, Term) = {
      val p = preds(rnd.nextInt(preds.length))
      val o: Term = p match {
        case "age" => Lit(rnd.nextInt(5).toString, Xsd.integer)
        case "name" => Lit("n" + rnd.nextInt(4), Xsd.string)
        case _ => Iri(ex + "t" + rnd.nextInt(3))
      }
      (subjects(rnd.nextInt(subjects.length)), p, o)
    }
    def lex(t: Term): String = t.canonical

    var graph = TriplesGraph.fromTerms(spark,
      Seq((Iri(ex + "s0"): Term, ex + "name", Lit("n0", Xsd.string))))
    val model = scala.collection.mutable.Set[(String, String, String)](
      ("s0", "name", "n0"))

    def tripleSyntax(s: String, p: String, o: Term): String = {
      val oTxt = o match {
        case Lit(v, dt, _) if dt == Xsd.integer => v
        case Lit(v, _, _) => "\"" + v + "\""
        case Iri(v) => s"<$v>"
        case other => fail(s"unexpected $other")
      }
      s"ex:$s ex:$p $oTxt"
    }

    for (step <- 1 to 40) {
      val batch = Seq.fill(1 + rnd.nextInt(3))(randTriple())
      val isInsert = rnd.nextBoolean()
      val op = (if (isInsert) "INSERT DATA" else "DELETE DATA") +
        batch.map { case (s, p, o) => tripleSyntax(s, p, o) }
          .mkString(" { ", " . ", " }")
      graph = SparqlUpdate.execute(graph, s"PREFIX ex:<$ex>\n" + op)
      batch.foreach { case (s, p, o) =>
        if (isInsert) model += ((s, p, lex(o))) else model -= ((s, p, lex(o)))
      }
      if (step % 10 == 0) { // full-state compare every few steps
        val got = new SparqlExecutor(graph)
          .execute(s"PREFIX ex:<$ex> SELECT ?s ?p ?o WHERE { ?s ?p ?o }")
          .collect()
          .map(r => (r.getString(0).stripPrefix(ex),
            r.getString(1).stripPrefix(ex), r.getString(2)))
          .toSet
        assert(got == model.toSet, s"divergence at step $step")
      }
    }
  }

  test("update survives a persisted-store round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-upd-store").toString
    val g0 = TriplesGraph.fromTerms(spark, Seq(
      (Iri(ex + "a"): Term, ex + "name", Lit("Alice", Xsd.string): Term),
      (Iri(ex + "a"): Term, ex + "age", Lit("30", Xsd.integer): Term),
      (Iri(ex + "b"): Term, ex + "name", Lit("Bob", Xsd.string): Term)))
    g0.save(dir)
    val loaded = TriplesGraph.load(spark, dir)
    val updated = SparqlUpdate.execute(loaded,
      s"""PREFIX ex:<$ex>
         |DELETE { ?s ex:name ?n } INSERT { ?s ex:name "Renamed" }
         |WHERE { ?s ex:name ?n . FILTER(?n = "Alice") } ;
         |INSERT DATA { ex:c ex:age 99 }""".stripMargin)
    // updated graph queries correctly in memory
    def names(g: TriplesGraph) = new SparqlExecutor(g)
      .execute(s"PREFIX ex:<$ex> SELECT ?n WHERE { ?s ex:name ?n } ORDER BY ?n")
      .collect().map(_.getString(0)).toSeq
    assert(names(updated) == Seq("Bob", "Renamed"))
    // and persists + reloads (re-save re-buckets; store pointer was cleared)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-upd-store2").toString
    updated.save(dir2)
    val reloaded = TriplesGraph.load(spark, dir2)
    assert(names(reloaded) == Seq("Bob", "Renamed"))
    val ages = new SparqlExecutor(reloaded)
      .execute(s"PREFIX ex:<$ex> SELECT ?a WHERE { ?s ex:age ?a } ORDER BY ?a")
      .collect().map(_.getLong(0)).toSeq
    assert(ages == Seq(30L, 99L))
  }

  test("saveDelta rewrites only the touched predicate directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft-savedelta").toString
    val g0 = TriplesGraph.fromTerms(spark, Seq(
      (Iri(ex + "a"): Term, ex + "name", Lit("Alice", Xsd.string): Term),
      (Iri(ex + "b"): Term, ex + "name", Lit("Bob", Xsd.string): Term),
      (Iri(ex + "a"): Term, ex + "age", Lit("30", Xsd.integer): Term),
      (Iri(ex + "a"): Term, ex + "tag", Iri(ex + "t1"): Term)))
    g0.save(dir)

    def partFiles(): Map[String, Long] = {
      val buf = scala.collection.mutable.Map.empty[String, Long]
      def walk(f: java.io.File): Unit =
        if (f.isDirectory) f.listFiles().foreach(walk)
        else if (f.getName.endsWith(".parquet"))
          buf(f.getAbsolutePath) = f.lastModified()
      walk(new java.io.File(dir))
      buf.toMap
    }
    val before = partFiles()

    val loaded = TriplesGraph.load(spark, dir)
    val updated = SparqlUpdate.execute(loaded,
      s"""PREFIX ex:<$ex>
         |DELETE DATA { ex:b ex:name "Bob" } ;
         |INSERT DATA { ex:c ex:name "Cara" }""".stripMargin)
    assert(updated.touched == Set(ex + "name"))
    updated.saveDelta(dir)

    val after = partFiles()
    // every untouched predicate's files are byte-level untouched
    val untouchedBefore = before.filterNot(_._1.contains("name"))
    val untouchedAfter = after.filterNot(_._1.contains("name"))
    assert(untouchedBefore == untouchedAfter,
      s"untouched files changed: before=$untouchedBefore after=$untouchedAfter")
    // the name partitions were rewritten (different file set)
    assert(before.keySet.filter(_.contains("name")) !=
      after.keySet.filter(_.contains("name")))

    val reloaded = TriplesGraph.load(spark, dir)
    val names = new SparqlExecutor(reloaded)
      .execute(s"PREFIX ex:<$ex> SELECT ?n WHERE { ?s ex:name ?n } ORDER BY ?n")
      .collect().map(_.getString(0)).toSeq
    assert(names == Seq("Alice", "Cara"))
    // untouched predicates still read correctly
    val tags = new SparqlExecutor(reloaded)
      .execute(s"PREFIX ex:<$ex> SELECT ?t WHERE { ex:a ex:tag ?t }")
      .collect().map(_.getString(0)).toSeq
    assert(tags == Seq(ex + "t1"))
  }

  test("compact collapses partition files, preserves contents and sidecar") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val terms = (0 until 200).flatMap { i =>
      Seq((Iri(s"$ex s$i"): Term, ex + "name", Lit(s"n$i", Xsd.string): Term),
        (Iri(s"$ex s$i"): Term, ex + "age", Lit(i.toString, Xsd.integer): Term))
    }
    TriplesGraph.fromTerms(spark, terms).save(dir)
    // fragment: a couple of delta cycles with multi-task appends
    var g = TriplesGraph.load(spark, dir)
    g = SparqlUpdate.execute(g,
      s"""PREFIX ex:<$ex> INSERT DATA { ex:extra ex:name "X" }""")
    g.saveDelta(dir)

    def files(): Seq[String] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      def walk(f: java.io.File): Unit =
        if (f.isDirectory) f.listFiles().foreach(walk)
        else if (f.getName.endsWith(".parquet")) buf += f.getAbsolutePath
      walk(new java.io.File(dir)); buf.toSeq
    }
    def names(): Seq[String] = new SparqlExecutor(TriplesGraph.load(spark, dir))
      .execute(s"PREFIX ex:<$ex> SELECT ?n WHERE { ?s ex:name ?n } ORDER BY ?n")
      .collect().map(_.getString(0)).toSeq

    // the aligned-write discipline (round 14): save and saveDelta
    // repartition by the partition columns, so a fresh store is BORN
    // compact — exactly one data file per partition directory
    assert(files().size ==
      files().map(f => new java.io.File(f).getParent).distinct.size,
      "save/saveDelta must land one file per partition directory")
    // give compaction something real to collapse: fragment one leaf the
    // way a pre-alignment writer (or an external tool) would have
    val leaf = new java.io.File(files().head).getParent
    val leafDf = spark.read.parquet(leaf).localCheckpoint()
    leafDf.repartition(3).write.mode("overwrite").parquet(leaf)
    val beforeFiles = files().size
    val beforeNames = names()
    TriplesGraph.compact(spark, dir)
    val afterFiles = files().size
    assert(afterFiles < beforeFiles,
      s"compact did not shrink file count: $beforeFiles -> $afterFiles")
    assert(names() == beforeNames)
    // sidecar survived: a fresh load must not fall back to caller defaults
    assert(TriplesGraph.readMeta(spark, dir).nonEmpty)
  }

  test("saveDelta removes a fully-deleted predicate's directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft-savedelta2").toString
    val g0 = TriplesGraph.fromTerms(spark, Seq(
      (Iri(ex + "a"): Term, ex + "name", Lit("Alice", Xsd.string): Term),
      (Iri(ex + "a"): Term, ex + "tag", Iri(ex + "t1"): Term)))
    g0.save(dir)
    val updated = SparqlUpdate.execute(TriplesGraph.load(spark, dir),
      s"PREFIX ex:<$ex> DELETE WHERE { ?s ex:tag ?t }")
    updated.saveDelta(dir)
    val reloaded = TriplesGraph.load(spark, dir)
    assert(new SparqlExecutor(reloaded)
      .execute(s"PREFIX ex:<$ex> SELECT ?t WHERE { ?s ex:tag ?t }").isEmpty)
    assert(!new SparqlExecutor(reloaded)
      .execute(s"PREFIX ex:<$ex> SELECT ?n WHERE { ?s ex:name ?n }").isEmpty)
  }
}
