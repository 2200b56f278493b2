package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/**
 * Synthetic IMDB fixtures for the real-text JOB workload
 * ([[JobRealQueries]]): the 21-table IMDB schema at the published
 * relative cardinalities (Leis et al., VLDB 2015, table 1 — title 2.5M,
 * cast_info 36M, movie_info 14.8M, … at factor 1.0), scaled by the
 * `factor` argument.
 *
 * Everything is DETERMINISTIC (xxhash64 of the row id + a per-column
 * seed — no Math.random), so fixtures regenerate bit-identically and
 * any differential failure replays. Value vocabularies are aligned with
 * the workload's predicates (the published constants: info_type kinds,
 * country codes, the '(voice)'/'(co-production)' note grammar, rating
 * strings, release-date strings), and a small PLANTED block occupies
 * the low id range of each table so the workload's tightest conjunctions
 * (Shrek 2 ∧ char Queen ∧ computer-animation ∧ voice actress; Kung Fu
 * Panda; One Piece/Dragon Ball Z dubs) return rows on synthetic data
 * exactly like they do on IMDB.
 *
 * Usage: runMain graft.tools.ImdbFixtures <outDir> [factor=0.1]
 */
object ImdbFixtures {

  // ---- shared vocab (kept in sync with JobRealQueries predicates) ----

  private val infoTypes = Seq("top 250 rank", "bottom 10 rank", "rating",
    "votes", "genres", "budget", "release dates", "countries",
    "mini biography", "trivia", "languages", "runtimes", "color info",
    "sound mix", "certificates", "taglines", "plot", "height", "quotes",
    "birth date")
  private val companyTypes = Seq("production companies", "distributors",
    "special effects companies", "miscellaneous companies")
  private val kindTypes = Seq("movie", "episode", "tv series", "tv movie",
    "video movie", "tv mini series", "video game")
  private val compCastTypes = Seq("cast", "crew", "complete",
    "complete+verified")
  private val linkTypes = Seq("follows", "followed by", "remake of",
    "remade as", "references", "referenced in", "spoofs", "spoofed in",
    "features", "featured in", "spin off from", "spin off", "version of",
    "similar to", "edited into", "edited from",
    "alternate language version of", "unknown")
  private val roleTypes = Seq("actor", "actress", "producer", "writer",
    "cinematographer", "composer", "costume designer", "director",
    "editor", "miscellaneous crew", "production designer", "guest")

  private val namedKeywords = Seq("character-name-in-title", "sequel",
    "prequel-and-sequel", "marvel-cinematic-universe", "superhero",
    "second-part", "marvel-comics", "based-on-comic", "tv-special",
    "fight", "violence", "murder", "murder-in-title", "blood", "revenge",
    "based-on-novel", "hero", "martial-arts", "hand-to-hand-combat",
    "computer-animated-movie", "computer-animation", "blood-splatter",
    "cigarette-smoking", "gore", "death", "female-nudity", "hospital",
    "magnet", "web", "claw", "laser", "10,000-mile-club", "nerd", "loner",
    "alienation", "dignity", "love", "friendship", "family-relationships",
    "independent-film", "police", "dog", "new-york-city")

  private val countryCodes = Seq("[us]", "[us]", "[us]", "[us]", "[gb]",
    "[de]", "[fr]", "[jp]", "[it]", "[es]", "[in]", "[ca]", "[ru]",
    "[nl]", "[se]", "[dk]", "[no]", "[pl]", "[bg]", "[sm]")

  private val companyStems = Seq("Warner Bros. Pictures",
    "Twentieth Century Fox Film Corporation", "20th Century Fox Television",
    "Lionsgate Films", "Lionsgate Television", "DreamWorks Animation",
    "YouTube", "Universal Pictures", "Nordisk Film", "Svensk Filmindustri",
    "Bavaria Film", "Toho Film", "Mosfilm", "Gaumont Film Company",
    "Paramount Pictures", "Columbia Pictures", "New Line Cinema",
    "Studio Babelsberg Film", "Pathe Films", "Castle Rock Entertainment")

  private val genres = Seq("Drama", "Horror", "Thriller", "Action",
    "Sci-Fi", "Crime", "War", "Western", "Family", "Comedy", "Romance",
    "Documentary", "Adventure", "Animation", "Mystery", "Musical")
  private val countries = Seq("USA", "Germany", "Sweden", "Norway",
    "Denmark", "Bulgaria", "France", "Japan", "UK", "Italy", "Spain",
    "Canada", "India", "Russia", "Netherlands", "Poland")
  private val languages = Seq("English", "German", "Swedish", "Norwegian",
    "Danish", "Denish", "American", "French", "Japanese", "Italian",
    "Spanish", "Russian", "Dutch", "Hindi")

  private val mcNoteTokens = Seq("(co-production)", "(presents)",
    "(as Metro-Goldwyn-Mayer Pictures)", "(theatrical)", "(France)",
    "(VHS)", "(USA)", "(1994)", "(2006)", "(2007)", "(2008)", "(2010)",
    "(worldwide)", "(Japan)", "(TV)", "(Blu-ray)", "(DVD)", "(video)",
    "(Germany)", "(UK)")

  private val ciNotes = Seq("(voice)", "(voice: English version)",
    "(voice: Japanese version)", "(voice) (uncredited)", "(producer)",
    "(executive producer)", "(writer)", "(head writer)", "(written by)",
    "(story)", "(story editor)", "(uncredited)", "(archive footage)",
    "(co-producer)", "(associate producer)")

  private val surnames = Seq("Anderson", "Baker", "Bertelli", "Bright",
    "Carter", "Downey Jr.", "Dixon", "Evans", "Foster", "Garcia",
    "Hansen", "Ivanov", "Johansson", "Kimura", "Larsen", "Miller",
    "Nakamura", "Olsen", "Petrov", "Quinn", "Rogers", "Schmidt",
    "Timberlake", "Ullman", "Vasquez", "Weber", "Xu", "Yoshida",
    "Yokoyama", "Zane", "Zimmermann", "Bauer", "Xanthos", "Yun")
  private val femaleFirsts = Seq("Angelina", "Angela", "Anna", "Anne",
    "Angelica", "Beatrice", "Carla", "Diana", "Elena", "Frida", "Yoko",
    "Antonia", "Bianca", "Clara")
  private val maleFirsts = Seq("Robert", "Bert", "Tim", "Timothy",
    "Albert", "Boris", "Carl", "David", "Erik", "Frank", "Georg",
    "Hiro", "Ivan", "James")

  private val charNames = Seq("Queen", "Tony Stark", "Iron Man", "Batman",
    "Spider-Man", "Superman", "Sherlock Holmes", "The Old Man", "Wise Man",
    "Po", "Tigress", "Shrek", "Princess Fiona", "Donkey", "King",
    "Soldier", "Doctor", "Nurse", "Policeman", "Anchorman", "Best Man",
    "Madman", "Chairman", "Woman in Cafe", "Girl", "Boy", "Teacher",
    "Detective", "Captain", "Professor")

  private val titleWords1 = Seq("The", "A", "Return of the", "Night of the",
    "Rise of the", "Last", "First", "Dark", "Silent", "Golden", "Lost",
    "Hidden", "Broken", "Eternal", "Final")
  private val titleWords2 = Seq("Champion", "Loser", "Murder", "Mord",
    "Vampire", "Hero", "Dragon", "Shadow", "River", "Mountain", "City",
    "Garden", "Winter", "Summer", "Stranger", "Hunter", "Kingdom",
    "Voyage", "Secret", "Promise")
  private val titleWords3 = Seq("Movie", "Story", "Chronicles", "Returns",
    "Begins", "Forever", "II", "III", "of Destiny", "in Paris",
    "at Midnight", "Reborn", "Affair", "Legacy", "Mystery", "Game")

  // planted hero block: the low-id titles the tightest variants hit
  private val plantedTitles = Seq(
    ("Shrek 2", "movie", 2004),
    ("Kung Fu Panda", "movie", 2008),
    ("Kung Fu Panda 2", "movie", 2011),
    ("One Piece: The Movie", "movie", 2006),
    ("Dragon Ball Z: The Movie", "movie", 2007),
    ("Birdemic: Shock and Terror", "movie", 2010),
    ("Freddy vs. Jason", "movie", 2003),
    ("Saw II", "movie", 2005),
    ("Vampire Reborn", "movie", 2012),
    ("Murder on the Midnight Express", "movie", 2011))

  // ---- deterministic pick helpers ----

  /** Deterministic uniform pick from a literal pool, seeded per column. */
  private def pick(pool: Seq[String], seed: Int, idCol: Column = col("id")): Column =
    element_at(
      array(pool.map(lit): _*),
      (pmod(xxhash64(idCol, lit(seed)), lit(pool.size)) + 1).cast("int"))

  /** Deterministic uniform long in [0, n). */
  private def h(n: Long, seed: Int, idCol: Column = col("id")): Column =
    pmod(xxhash64(idCol, lit(seed)), lit(n))

  /** Deterministic double in [0, 1). */
  private def u(seed: Int, idCol: Column = col("id")): Column =
    h(1000000L, seed, idCol).cast("double") / lit(1000000.0)

  /** FK into [1, n] with BOUNDED skew: 1 in 4 rows lands uniformly in
    * the "popular" low-5% id range (each hot id draws ~6× the uniform
    * rate), the rest uniform. Popularity is real in IMDB, but an
    * UNBOUNDED concentration (an earlier u² draw put ~0.1% of all
    * bridge rows on id 1) cross-products catastrophically in the
    * multi-bridge JOB queries — each movie's join output is the PRODUCT
    * of its per-bridge row counts, so per-id mass must stay O(1/n). */
  private def fk(n: Long, seed: Int, idCol: Column = col("id")): Column = {
    val hot = math.max(1L, n / 20)
    when(h(4, seed + 7, idCol) === 0, h(hot, seed + 11, idCol) + 1)
      .otherwise(h(n, seed, idCol) + 1)
  }

  /** production_year skewed toward the recent decades (real IMDB shape);
    * ~4% NULL. */
  private def productionYear(seed: Int): Column =
    when(h(25, seed + 13) === 0, lit(null).cast("int"))
      .otherwise((lit(2013) - (pow(u(seed), lit(3.0)) * lit(120.0)))
        .cast("int"))

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "args: <outDir> [factor=0.1]")
    val outDir = args(0)
    val factor = args.drop(1).headOption.map(_.toDouble).getOrElse(0.1)
    val spark = GraftSession.build(appName = "graft-imdb-fixtures")
    write(spark, outDir, factor)
    spark.stop()
  }

  /** Generate all 21 tables under `outDir`. Exposed for the test suite
    * (tiny factors generate in seconds). */
  def write(spark: SparkSession, outDir: String, factor: Double): Unit = {
    def n(base: Long): Long = math.max(20L, (base * factor).toLong)

    val nTitle = n(2528312)
    val nName = n(4167491)
    val nChar = n(3140339)
    val nCompany = n(234997)
    val nKeyword = n(134170)

    def rangeDf(rows: Long): DataFrame =
      spark.range(1, rows + 1).toDF("id")
        .repartition(math.max(1, (rows / 2000000L).toInt + 1))

    def save(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      // scalastyle:off println
      println(s"[imdb] wrote $name")
      // scalastyle:on println
    }

    // ---- enum tables (fixed size at every factor, like the original) ----
    def enumTable(vals: Seq[String], colName: String): DataFrame = {
      import spark.implicits._
      vals.zipWithIndex.map { case (v, i) => (i + 1L, v) }
        .toDF("id", colName).coalesce(1)
    }
    save("info_type", enumTable(infoTypes, "info"))
    save("company_type", enumTable(companyTypes, "kind"))
    save("kind_type", enumTable(kindTypes, "kind"))
    save("comp_cast_type", enumTable(compCastTypes, "kind"))
    save("link_type", enumTable(linkTypes, "link"))
    save("role_type", enumTable(roleTypes, "role"))

    // info_type ids the generators below key on (1-based in the enum)
    def it(name: String): Int = infoTypes.indexOf(name) + 1
    def kt(name: String): Int = kindTypes.indexOf(name) + 1

    // ---- title ----
    val plantedN = plantedTitles.size
    val titleSynth = rangeDf(nTitle).select(
      col("id"),
      concat_ws(" ", pick(titleWords1, 101), pick(titleWords2, 102),
        pick(titleWords3, 103)).as("title"),
      // kind skew: ~45% movie, ~30% episode, rest spread
      when(h(100, 104) < 45, lit(kt("movie")))
        .when(h(100, 104) < 75, lit(kt("episode")))
        .otherwise(h(kindTypes.size, 105).cast("int") + 1).as("kind_id"),
      productionYear(106).as("production_year"))
      .withColumn("season_nr",
        when(col("kind_id") === kt("episode"), (h(12, 107) + 1).cast("int"))
          .otherwise(lit(null).cast("int")))
      .withColumn("episode_nr",
        when(col("kind_id") === kt("episode"), (h(300, 108) + 1).cast("int"))
          .otherwise(lit(null).cast("int")))
      .withColumn("series_years",
        when(col("kind_id") === kt("tv series"), lit("1998-2008"))
          .otherwise(lit(null).cast("string")))
      .where(col("id") > plantedN)
    val titlePlanted = {
      import spark.implicits._
      plantedTitles.zipWithIndex.map { case ((tt, kk, yy), i) =>
        (i + 1L, tt, kt(kk), yy, Option.empty[Int], Option.empty[Int],
          Option.empty[String])
      }.toDF("id", "title", "kind_id", "production_year", "season_nr",
        "episode_nr", "series_years")
    }
    save("title", titlePlanted.unionByName(titleSynth))

    // ---- keyword (named vocab occupies the low ids) ----
    val kwSynth = rangeDf(nKeyword).select(col("id"),
      concat(lit("kw-"), col("id").cast("string"),
        pick(Seq("-club", "-title", "-life", "-story", ""), 110))
        .as("keyword"))
      .where(col("id") > namedKeywords.size)
    save("keyword", enumTable(namedKeywords, "keyword").unionByName(kwSynth))

    // ---- company_name (stems on low ids; country codes weighted [us]) ----
    val cnSynth = rangeDf(nCompany).select(col("id"),
      concat(pick(Seq("Silver", "Golden", "Northern", "Atlantic", "Pacific",
        "Riverside", "Metro", "Alpine", "Coastal", "Capital"), 120),
        lit(" "),
        pick(Seq("Film", "Films", "Pictures", "Entertainment", "Media",
          "Productions", "Film Works", "Studios"), 121),
        lit(" "), col("id").cast("string")).as("name"),
      pick(countryCodes, 122).as("country_code"))
      .where(col("id") > companyStems.size)
    val cnPlanted = {
      import spark.implicits._
      companyStems.zipWithIndex.map { case (nm, i) =>
        val cc = nm match {
          case "Nordisk Film" => "[dk]"
          case "Svensk Filmindustri" => "[se]"
          case "Bavaria Film" | "Studio Babelsberg Film" => "[de]"
          case "Toho Film" => "[jp]"
          case "Mosfilm" => "[ru]"
          case "Gaumont Film Company" | "Pathe Films" => "[fr]"
          case _ => "[us]"
        }
        (i + 1L, nm, cc)
      }.toDF("id", "name", "country_code")
    }
    save("company_name", cnPlanted.unionByName(cnSynth))

    // ---- char_name ----
    val chnSynth = rangeDf(nChar).select(col("id"),
      concat(pick(Seq("Old", "Young", "Tall", "First", "Second", "Masked",
        "Mysterious", "Brave"), 130), lit(" "),
        pick(Seq("Man", "Woman", "Officer", "Doctor", "Gentleman", "Lady",
          "Salesman", "Watchman", "King", "Servant"), 131),
        lit(" #"), col("id").cast("string")).as("name"))
      .where(col("id") > charNames.size)
    save("char_name", enumTable(charNames, "name").unionByName(chnSynth))

    // ---- name (gender correlated with first-name pool) ----
    // planted persons 1-8 carry the cast_info plant's required
    // attributes: female '%An%' voice actresses (Shrek 2 / Kung Fu
    // Panda), '%Yo%'-not-'%Yu%' dub actresses (One Piece / DBZ), and a
    // '%Downey%Robert%'
    val namePlanted = {
      import spark.implicits._
      Seq(
        (1L, "Anderson, Angelina", "f", "A101"),
        (2L, "Andrews, Anna", "f", "A102"),
        (3L, "Baker, Tim", "m", "B103"),
        (4L, "Angstrom, Antonia", "f", "A104"),
        (5L, "Anders, Angela", "f", "A105"),
        (6L, "Yoshida, Yoko", "f", "Y106"),
        (7L, "Yokoyama, Anna", "f", "Y107"),
        (8L, "Downey Jr., Robert", "m", "D108"))
        .map { case (i, nm, g, pc) =>
          (i, nm, Option.empty[String], g, pc)
        }.toDF("id", "name", "imdb_index", "gender", "name_pcode_cf")
    }
    val nameDf = rangeDf(nName).select(col("id"),
      when(h(100, 140) < 5, lit(null).cast("string"))
        .when(h(100, 140) < 40, lit("f")).otherwise(lit("m")).as("gender"),
      pick(surnames, 141).as("surname"))
      .withColumn("first",
        when(col("gender") === "f", pick(femaleFirsts, 142))
          .otherwise(pick(maleFirsts, 143)))
      .select(col("id"),
        concat(col("surname"), lit(", "), col("first")).as("name"),
        lit(null).cast("string").as("imdb_index"),
        col("gender"),
        concat(upper(substring(col("surname"), 1, 1)),
          h(900, 144).cast("string")).as("name_pcode_cf"))
      .where(col("id") > 8)
    save("name", namePlanted.unionByName(nameDf))

    // ---- aka_name (~22% of names have one; planted persons covered) ----
    val anPlanted = {
      import spark.implicits._
      Seq((1L, 1L, "Angie LaRue"), (2L, 2L, "Anna Banana"),
        (3L, 3L, "Tima Baker"), (4L, 4L, "Tonia Angstrom"),
        (5L, 5L, "Angel Anders"), (6L, 6L, "Yoko chan"),
        (7L, 7L, "Anna Yama"), (8L, 8L, "Bob Downey Jr."))
        .toDF("id", "person_id", "name")
    }
    save("aka_name", anPlanted.unionByName(
      rangeDf(n(901343)).select(col("id"),
        fk(nName, 150).as("person_id"),
        concat(pick(Seq("Aka", "Anna", "Abe", "Alan", "Mala", "Sasha",
          "Kata", "Ray", "Leo"), 151), lit(" "),
          pick(surnames, 152)).as("name"))
        .where(col("id") > 8)))

    // ---- aka_title ----
    save("aka_title", rangeDf(n(361472)).select(col("id"),
      fk(nTitle, 160).as("movie_id"),
      concat(lit("AKA "), pick(titleWords2, 161), lit(" "),
        pick(titleWords3, 162)).as("title"),
      (h(kindTypes.size, 163) + 1).cast("int").as("kind_id")))

    // ---- movie_companies ----
    // note: ~55% NULL; else 1-2 tokens, sometimes a year token (matching
    // the '%(200%)%' / '(1994)' / '(Japan)' predicate grammar). The
    // planted block ties the hero titles to their companies with the
    // exact notes the 1a/5b/8b/15a/19b/24b predicates need.
    val mcSynth = rangeDf(n(2609129)).select(col("id"),
      fk(nTitle, 170).as("movie_id"),
      fk(nCompany, 171).as("company_id"),
      (h(companyTypes.size, 172) + 1).cast("int").as("company_type_id"),
      when(h(100, 173) < 55, lit(null).cast("string"))
        .otherwise(concat_ws(" ", pick(mcNoteTokens, 174),
          when(h(3, 175) === 0, pick(mcNoteTokens, 176))
            .otherwise(lit(null).cast("string")))).as("note"))
      .where(col("id") > 10) // synthetic ids start past the planted block
    val mcPlanted = {
      import spark.implicits._
      // (movie_id, company_id, note); company_type_id is uniformly 1 =
      // 'production companies', the type every planted predicate names
      Seq(
        (1L, 1L, "(presents) (co-production)"), // Shrek 2 / DreamWorks
        (2L, 6L, "(presents) (worldwide)"), // KFP / DreamWorks
        (3L, 6L, "(2011) (worldwide)"), // KFP2 / DreamWorks
        (4L, 12L, "(Japan) (2006)"), // One Piece / Toho
        (5L, 12L, "(Japan) (2007)"), // DBZ / Toho
        (6L, 7L, "(2010) (worldwide)"), // Birdemic / YouTube
        (7L, 4L, "(Blu-ray) (USA)"), // FvJ / Lionsgate
        (8L, 4L, "(Blu-ray) (2006)"), // Saw II / Lionsgate
        (9L, 1L, "(theatrical) (France)"),
        (10L, 2L, "(co-production) (presents)"))
        .zipWithIndex.map { case ((m, c, nt), i) =>
          (i + 1L, m, c, 1L, nt)
        }.toDF("id", "movie_id", "company_id", "company_type_id", "note")
    }
    save("movie_companies", mcPlanted.unionByName(mcSynth))

    // ---- movie_info ----
    // info_type split mirrors IMDB: release dates / genres / countries /
    // languages / budget dominate. Values follow the predicate grammar
    // ('USA:12 May 2004' matches both 'USA:% 200%' and 'USA:%200%').
    val miTypePick = h(100, 180)
    val relYear = (h(25, 181) + lit(1989)).cast("string") // 1989-2013
    val relDate = concat(
      pick(Seq("USA", "USA", "USA", "Japan", "Germany", "France", "UK",
        "Sweden"), 182),
      lit(":"), (h(28, 183) + 1).cast("string"), lit(" "),
      pick(Seq("January", "February", "March", "April", "May", "June",
        "July", "August", "September", "October", "November",
        "December"), 184),
      lit(" "), relYear)
    val miSynth = rangeDf(n(14835720)).select(col("id"),
      fk(nTitle, 185).as("movie_id"),
      when(miTypePick < 30, lit(it("release dates")))
        .when(miTypePick < 50, lit(it("genres")))
        .when(miTypePick < 65, lit(it("countries")))
        .when(miTypePick < 80, lit(it("languages")))
        .when(miTypePick < 88, lit(it("budget")))
        .otherwise(lit(it("runtimes"))).cast("int").as("info_type_id"))
      .withColumn("info",
        when(col("info_type_id") === it("release dates"), relDate)
          .when(col("info_type_id") === it("genres"), pick(genres, 186))
          .when(col("info_type_id") === it("countries"), pick(countries, 187))
          .when(col("info_type_id") === it("languages"), pick(languages, 188))
          .when(col("info_type_id") === it("budget"),
            concat(lit("$"), (h(200, 189) * 500000 + 100000).cast("string")))
          .otherwise((h(180, 190) + 20).cast("string")))
      .withColumn("note",
        when(h(100, 191) < 80, lit(null).cast("string"))
          .otherwise(pick(Seq("(internet)", "(premiere)", "(DVD premiere)",
            "(TV premiere)", "(limited)", "(worldwide internet release)"),
            192)))
      .where(col("id") > 10)
    val miPlanted = {
      import spark.implicits._
      Seq(
        (1L, it("release dates").toLong, "USA:19 May 2004", "(premiere)"),
        (1L, it("genres").toLong, "Animation", null),
        (2L, it("release dates").toLong, "USA:6 June 2008", "(internet)"),
        (2L, it("genres").toLong, "Animation", null),
        (3L, it("release dates").toLong, "USA:26 May 2011", null),
        (4L, it("release dates").toLong, "Japan:4 March 2006", null),
        (5L, it("release dates").toLong, "Japan:12 July 2007", null),
        (6L, it("release dates").toLong, "USA:27 February 2010",
          "(worldwide internet release)"),
        (7L, it("genres").toLong, "Horror", null),
        (8L, it("genres").toLong, "Horror", null))
        .zipWithIndex.map { case ((m, ty, info, nt), i) =>
          (i + 1L, m, ty, info, nt)
        }.toDF("id", "movie_id", "info_type_id", "info", "note")
    }
    save("movie_info", miPlanted.unionByName(miSynth))

    // ---- movie_info_idx (rating / votes / top-bottom ranks) ----
    val miiTypePick = h(100, 200)
    val miiSynth = rangeDf(n(1380035)).select(col("id"),
      fk(nTitle, 201).as("movie_id"),
      when(miiTypePick < 45, lit(it("rating")))
        .when(miiTypePick < 90, lit(it("votes")))
        .when(miiTypePick < 95, lit(it("top 250 rank")))
        .otherwise(lit(it("bottom 10 rank"))).cast("int").as("info_type_id"))
      .withColumn("info",
        when(col("info_type_id") === it("rating"),
          format_string("%.1f", h(90, 202).cast("double") / 10.0 + 1.0))
          .when(col("info_type_id") === it("votes"),
            (h(2000000, 203) + 5).cast("string"))
          .otherwise((h(250, 204) + 1).cast("string")))
      .withColumn("note", lit(null).cast("string"))
      .where(col("id") > 8)
    val miiPlanted = {
      import spark.implicits._
      Seq(
        (1L, it("rating").toLong, "7.3"), (1L, it("votes").toLong, "400000"),
        (1L, it("top 250 rank").toLong, "248"),
        (2L, it("rating").toLong, "7.6"), (2L, it("votes").toLong, "250000"),
        (6L, it("bottom 10 rank").toLong, "3"),
        (7L, it("rating").toLong, "5.0"), (8L, it("rating").toLong, "6.6"))
        .zipWithIndex.map { case ((m, ty, info), i) =>
          (i + 1L, m, ty, info, Option.empty[String])
        }.toDF("id", "movie_id", "info_type_id", "info", "note")
    }
    save("movie_info_idx", miiPlanted.unionByName(miiSynth))

    // ---- movie_keyword ----
    val kwNamed = namedKeywords.size.toLong
    val mkSynth = rangeDf(n(4523930)).select(col("id"),
      fk(nTitle, 210).as("movie_id"),
      // 1 in 4 rows draws from the named vocab (they are the high-traffic
      // keywords in IMDB too: character-name-in-title alone tags ~6% of
      // movie_keyword)
      when(h(4, 211) === 0, h(kwNamed, 212) + 1)
        .otherwise(fk(nKeyword, 213)).as("keyword_id"))
      .where(col("id") > 14)
    val mkPlanted = {
      import spark.implicits._
      def kid(kw: String): Long = namedKeywords.indexOf(kw) + 1L
      Seq(
        (1L, kid("computer-animation")), (1L, kid("character-name-in-title")),
        (2L, kid("martial-arts")), (2L, kid("hero")),
        (2L, kid("computer-animated-movie")), (2L, kid("hand-to-hand-combat")),
        (3L, kid("martial-arts")), (3L, kid("sequel")),
        (4L, kid("character-name-in-title")), (5L, kid("fight")),
        (6L, kid("10,000-mile-club")), (7L, kid("murder")),
        (8L, kid("gore")), (8L, kid("sequel")))
        .zipWithIndex.map { case ((m, k), i) => (i + 1L, m, k) }
        .toDF("id", "movie_id", "keyword_id")
    }
    save("movie_keyword", mkPlanted.unionByName(mkSynth))

    // ---- cast_info (the 36M-row giant) ----
    val ciSynth = rangeDf(n(36244344)).select(col("id"),
      fk(nName, 220).as("person_id"),
      fk(nTitle, 221).as("movie_id"),
      when(h(100, 222) < 40, lit(null).cast("long"))
        .otherwise(fk(nChar, 223)).as("person_role_id"),
      when(h(100, 224) < 70, lit(null).cast("string"))
        .otherwise(pick(ciNotes, 225)).as("note"),
      (h(60, 226) + 1).cast("int").as("nr_order"),
      // role skew: actor/actress dominate
      when(h(100, 227) < 35, lit(1L))
        .when(h(100, 227) < 60, lit(2L))
        .otherwise(h(roleTypes.size, 228) + 1).as("role_id"))
      .where(col("id") > 8)
    val ciPlanted = {
      import spark.implicits._
      def chid(c: String): Long = charNames.indexOf(c) + 1L
      // person_id 1/2 are forced below via the name table order? No —
      // names are fully synthetic; the voice-actress predicates
      // (gender f, '%An%'/'%Angel%') hit the synthetic pool broadly, so
      // the plant just needs SOME female-named person: the surname pool
      // ensures many. Use low person ids; their attributes are synthetic
      // but the movie-side conjunction is the tight part.
      Seq(
        (1L, 1L, chid("Queen"), "(voice)", 1, 2L), // Shrek 2
        (2L, 1L, chid("Princess Fiona"), "(voice: English version)", 2, 2L),
        (3L, 2L, chid("Po"), "(voice)", 1, 1L), // KFP
        (4L, 2L, chid("Tigress"), "(voice)", 2, 2L),
        (5L, 3L, chid("Tigress"), "(voice) (uncredited)", 2, 2L),
        (6L, 4L, chid("Captain"), "(voice: English version)", 1, 2L),
        (7L, 5L, chid("Soldier"), "(voice: English version)", 1, 2L),
        (8L, 8L, chid("Detective"), "(writer)", 1, 4L))
        .zipWithIndex.map { case ((p, m, cr, nt, ord, r), i) =>
          (i + 1L, p, m, Option(cr), Option(nt), ord, r)
        }.toDF("id", "person_id", "movie_id", "person_role_id", "note",
          "nr_order", "role_id")
    }
    save("cast_info", ciPlanted.unionByName(ciSynth))

    // ---- person_info (planted: trivia + a Volker Boehm biography for
    // every planted person — 29a joins pi on 'trivia') ----
    val piPlanted = {
      import spark.implicits._
      (1L to 8L).flatMap { p =>
        Seq((p * 2 - 1, p, it("trivia").toLong, s"Trivia for person $p",
          Option.empty[String]),
          (p * 2, p, it("mini biography").toLong, s"Biography of person $p",
            Option("Volker Boehm")))
      }.toDF("id", "person_id", "info_type_id", "info", "note")
    }
    save("person_info", piPlanted.unionByName(
      rangeDf(n(2963664)).select(col("id"),
        fk(nName, 230).as("person_id"),
        when(h(100, 231) < 40, lit(it("mini biography")))
          .when(h(100, 231) < 70, lit(it("trivia")))
          .otherwise(lit(it("height"))).cast("int").as("info_type_id"),
        concat(lit("Info text "), col("id").cast("string")).as("info"),
        when(h(100, 232) < 30, lit("Volker Boehm"))
          .when(h(100, 232) < 60, pick(Seq("Anonymous", "Pedro Borges",
            "Film Society", "IMDb Editors"), 233))
          .otherwise(lit(null).cast("string")).as("note"))
        .withColumn("info_type_id", col("info_type_id").cast("long"))
        .where(col("id") > 16)))

    // ---- complete_cast (planted: the hero movies carry cast/complete+
    // verified rows — 29a requires them on Shrek 2) ----
    val ccPlanted = {
      import spark.implicits._
      Seq((1L, 1L, 1L, 4L), (2L, 1L, 2L, 3L), (3L, 2L, 1L, 4L),
        (4L, 3L, 1L, 4L), (5L, 8L, 1L, 4L), (6L, 6L, 2L, 3L))
        .toDF("id", "movie_id", "subject_id", "status_id")
    }
    save("complete_cast", ccPlanted.unionByName(
      rangeDf(n(135086)).select(col("id"),
        fk(nTitle, 240).as("movie_id"),
        (h(2, 241) + 1).cast("long").as("subject_id"), // cast / crew
        (h(2, 242) + 3).cast("long").as("status_id")) // complete / +verified
        .where(col("id") > 6)))

    // ---- movie_link (planted: hero links so the 32/33 two-hub
    // families and the 10,000-mile-club query are non-vacuous) ----
    val mlPlanted = {
      import spark.implicits._
      def lid(l: String): Long = linkTypes.indexOf(l) + 1L
      Seq((1L, 2L, 3L, lid("followed by")), (2L, 3L, 2L, lid("follows")),
        (3L, 6L, 7L, lid("similar to")), (4L, 1L, 9L, lid("references")))
        .toDF("id", "movie_id", "linked_movie_id", "link_type_id")
    }
    save("movie_link", mlPlanted.unionByName(
      rangeDf(n(29997)).select(col("id"),
        fk(nTitle, 250).as("movie_id"),
        fk(nTitle, 251).as("linked_movie_id"),
        (h(linkTypes.size, 252) + 1).cast("long").as("link_type_id"))
        .where(col("id") > 4)))
  }
}
