package graft.sources

import graft.model.RepoFile
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic repo-file corpus with known gold clusters
  * (FIXTURES.md §1). Seeded, no wall-clock, no network.
  *
  * E entity families × V variants: a family shares a canonical name;
  * variants carry aliases (`k8s` ≈ Crosswikis aliases), initialisms
  * (reference MentionPairFeatures.scala:26-27 `toAbbr`), bounded-edit typos,
  * and content drawn from a family vocabulary + shared noise vocabulary so
  * TF-IDF cosine within family ≫ across families (FIXTURES.md generator
  * design). Gold cluster id = family id.
  */
object SynthCorpus {

  final case class GoldRow(id: String, gold: String)

  private val canonicalNames = Vector(
    "kubernetes", "tensorflow", "postgresql", "elasticsearch", "prometheus",
    "cassandra", "zookeeper", "airflow", "hadoop", "terraform",
    "ansible", "grafana", "rabbitmq", "memcached", "nginx",
    "django", "flask", "pytorch", "numpy", "pandas")

  /** alias dictionary (plays wikimap.txt / AbbreviationData.scala:5-55) */
  val aliasDict: Map[String, String] = Map(
    "k8s" -> "kubernetes", "tf" -> "tensorflow", "pg" -> "postgresql",
    "postgres" -> "postgresql", "es" -> "elasticsearch", "prom" -> "prometheus",
    "zk" -> "zookeeper", "tfm" -> "terraform", "np" -> "numpy", "pd" -> "pandas")

  private val langs = Vector("scala", "py", "go", "java", "rs")

  // family vocabulary: 30 distinctive terms per family, deterministic
  private def famVocab(f: Int): Vector[String] =
    (0 until 30).map(i => s"fam${f}term$i").toVector
  private val noiseVocab: Vector[String] =
    (0 until 60).map(i => s"common$i").toVector

  /** xorshift-style deterministic PRNG (no java.util.Random to keep the
    * sequence pinned across JVMs).
    */
  private final class Rng(seed0: Long) {
    private var s: Long = seed0 * 0x9E3779B97F4A7C15L + 1
    def nextLong(): Long = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s
    }
    def nextInt(n: Int): Int = (math.abs(nextLong()) % n).toInt
    def nextDouble(): Double = (math.abs(nextLong()) % 1000000) / 1000000.0
  }

  private def typo(name: String, rng: Rng): String = {
    if (name.length < 5) name
    else {
      val i = 1 + rng.nextInt(name.length - 2)
      rng.nextInt(3) match {
        case 0 => name.substring(0, i) + name.substring(i + 1) // deletion
        case 1 => name.substring(0, i) + name.charAt(i) + name.substring(i) // dup
        case _ => name.substring(0, i) + "x" + name.substring(i + 1) // sub
      }
    }
  }

  private lazy val inverseAlias: Map[String, Vector[String]] =
    aliasDict.groupBy(_._2).map { case (k, v) => k -> v.keys.toVector }

  /** Generate one (file, goldClusterId) row — pure function of (f, v, seed)
    * so it can run inside executor tasks.
    */
  def row(f: Int, v: Int, variants: Int, seed: Long): (RepoFile, String) = {
    val canonical = canonicalNames(f % canonicalNames.length) +
      (if (f >= canonicalNames.length) s"${f / canonicalNames.length}" else "")
    val vocab = famVocab(f)
    val rng = new Rng(seed + f * 1000L + v)
    val surface = v % 4 match {
      case 0 => canonical
      case 1 => inverseAlias.get(canonical).map(_.head).getOrElse(canonical)
      case 2 => typo(canonical, rng)
      case _ => canonical // different org, same project name
    }
    val org = if (v % 4 == 3) s"fork$v" else s"org$f"
    // variants share a family base document with a few bounded edits —
    // like real forks/copies, so content k-shingles overlap within a
    // family (MinHash-band blocking recall) and TF-IDF cosine is high
    val baseRng = new Rng(seed + f * 7919L)
    val base = (0 until 120).map { i =>
      if (baseRng.nextDouble() < 0.7) vocab(baseRng.nextInt(vocab.length))
      else noiseVocab(baseRng.nextInt(noiseVocab.length))
    }.toArray
    val body = base.clone()
    (0 until 4).foreach { _ => // ~3% token churn per variant
      body(rng.nextInt(body.length)) = noiseVocab(rng.nextInt(noiseVocab.length))
    }
    val content = s"project $canonical module $v\n${body.mkString(" ")}"
    val commit = f"${rng.nextLong()}%016x${rng.nextLong()}%016x00000000"
    val file = RepoFile(
      repo = s"$org/$surface",
      path = s"src/main/${langs(v % langs.length)}/file$v.${langs(v % langs.length)}",
      commit = commit.take(40),
      lang = langs(v % langs.length),
      content = content)
    (file, s"FAM$f")
  }

  /** Generate `families` entity families with `variants` files each
    * (driver-side Seq; use `corpus` for the distributed frame).
    */
  def rows(families: Int = 20, variants: Int = 8, seed: Long = 42L): Seq[(RepoFile, String)] =
    for (f <- 0 until families; v <- 0 until variants) yield row(f, v, variants, seed)

  def corpus(spark: SparkSession, families: Int = 20, variants: Int = 8,
             seed: Long = 42L): DataFrame = {
    import spark.implicits._
    // generate distributed: one row per (family, variant) from spark.range,
    // built inside tasks — a driver-local Seq would make every downstream
    // narrow stage (tokenize/shingle/minhash) run on one LocalTableScan slice
    val n = families.toLong * variants
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        it.map { i =>
          val f = (i / variants).toInt
          val v = (i % variants).toInt
          row(f, v, variants, seed)._1
        }
      }
      .toDF()
  }

  def gold(spark: SparkSession, families: Int = 20, variants: Int = 8,
           seed: Long = 42L): DataFrame = {
    import spark.implicits._
    rows(families, variants, seed)
      .map { case (f, g) => GoldRow(s"${f.repo}/${f.path}@${f.commit}", g) }
      .toDF()
  }

  private val kbTypes = Vector("software", "database", "team")

  /** Canonical name of family f (same derivation `row` uses). */
  def canonicalOf(f: Int): String =
    canonicalNames(f % canonicalNames.length) +
      (if (f >= canonicalNames.length) s"${f / canonicalNames.length}" else "")

  /** Small KB entity table (plays the reference's KB + wikiMap + intro-text
    * maps, KBPQuery.scala:144-175): one entity per family — canonical name,
    * aliases, a type, and an intro paragraph built from the family
    * vocabulary so the intro's term vector is cosine-close to the family's
    * file contents (the docSimScore signal). Driver-side Seq is fine: the KB
    * is the broadcast dimension (|KB| ≪ |mentions|).
    */
  def kb(spark: SparkSession, families: Int = 20): DataFrame = {
    import spark.implicits._
    (0 until families).map { f =>
      val canonical = canonicalOf(f)
      graft.model.KbEntity(
        kbId = f"E$f%06d",
        kbName = canonical,
        kbType = kbTypes(f % kbTypes.length),
        aliases = inverseAlias.getOrElse(canonical, Vector.empty),
        intro = s"project $canonical ${famVocab(f).mkString(" ")}")
    }.toDF()
  }

  /** Extraction side table (reference S3/F10: per-doc OpenIE link ids from
    * ExtrSolrHelper): one row per (file id, extracted link id). Family-
    * correlated fbids plus a shared noise id, so linkSim is high within a
    * family and small-but-nonzero across.
    */
  def extractions(spark: SparkSession, families: Int = 20, variants: Int = 8,
                  seed: Long = 42L): DataFrame = {
    import spark.implicits._
    rows(families, variants, seed).flatMap { case (file, g) =>
      val f = g.stripPrefix("FAM").toInt
      val id = s"${file.repo}/${file.path}@${file.commit}"
      (0 until 4).map(k => (id, s"fb:$f:$k")) :+ ((id, "fb:common"))
    }.toDF("id", "fbid")
  }

  /** Arg-text extraction side table (reference F10 `argVec`,
    * MentionPairFeatures.scala:36,72: term vectors over OpenIE extraction
    * argument texts): one row per (file id, argText). Arg texts share the
    * family canonical name + two family terms, plus one common token — so
    * argSim is high within a family and small-but-nonzero across.
    */
  def argExtractions(spark: SparkSession, families: Int = 20, variants: Int = 8,
                     seed: Long = 42L): DataFrame = {
    import spark.implicits._
    rows(families, variants, seed).map { case (file, g) =>
      val f = g.stripPrefix("FAM").toInt
      val id = s"${file.repo}/${file.path}@${file.commit}"
      (id, s"${canonicalOf(f)} fam${f}term0 fam${f}term1 common0")
    }.toDF("id", "argText")
  }

  /** Gold mention→KB link: every member of family f belongs to entity
    * E%06d (for the KB-linking F1 gate and the B³ b3Correct clause).
    */
  def goldKb(spark: SparkSession, families: Int = 20, variants: Int = 8,
             seed: Long = 42L): DataFrame = {
    import spark.implicits._
    rows(families, variants, seed).map { case (file, g) =>
      val f = g.stripPrefix("FAM").toInt
      (s"${file.repo}/${file.path}@${file.commit}", f"E$f%06d")
    }.toDF("id", "goldKbId")
  }
}
