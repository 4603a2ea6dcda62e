package graft

import graft.meta.{TreeDefs, Trees}
import graft.meta.TreeDefs.{TreeDef, TreeStore}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/**
 * The `/api/tree` endpoint family — vectors ported from the
 * reference's test/tsd/TestTreeRpc.java (1,384 LoC) over
 * TreeRpc.java:92-556: tree-definition CRUD with the not-modified /
 * no-name / out-of-IDs / 16-bit-ID contracts, hex-addressed branch
 * browsing, rule CRUD's fetch-copy-save merge, bulk rules replace,
 * and the collisions/notmatched map documents. Error texts verbatim;
 * the storage fixture mirrors TestTreeRpc.setupStorage (two trees,
 * two rules each, the ROOT/sys/cpu + mboard branch pair, user/nice/
 * Asus leaves).
 */
class TreeRpcSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** TestTreeRpc.setupStorage: tree 1 = TestTree.buildTestTree()
    * (name "Test Tree", description "My Description", notes
    * "Details", enabled, created 1356998400), tree 2 = "2nd Tree";
    * rules 0:0 TAGK host ("Host Name") + 1:0 METRIC ("Metric rule")
    * per tree; branches ROOT→sys/cpu→mboard with leaves user/nice
    * (on cpu) and Asus (on mboard), all metric sys.cpu.0. */
  def setupStore(): TreeStore = {
    import spark.implicits._
    val trees = Seq(
      TreeDef(1, "Test Tree", "My Description", "Details",
        strictMatch = false, enabled = true, storeFailures = false,
        created = 1356998400L),
      TreeDef(2, "2nd Tree", "Other Tree")).toDS().toDF()
    val rules = Seq(
      Trees.Rule(1, 0, 0, "TAGK", field = "host",
        description = "Host Name"),
      Trees.Rule(1, 1, 0, "METRIC", notes = "Metric rule"),
      Trees.Rule(2, 0, 0, "TAGK", field = "host"),
      Trees.Rule(2, 1, 0, "METRIC")).toDS().toDF()
    val branches = Seq(
      (1, 2, "sys/cpu", "cpu", "sys", 2L),
      (1, 3, "sys/cpu/mboard", "mboard", "sys/cpu", 1L))
      .toDF("tree_id", "depth", "path", "name", "parent", "leaves")
    val leaves = Seq(
      (1, "sys/cpu", "user", "000001000001000001", "sys.cpu.0",
        Map("host" -> "web01")),
      (1, "sys/cpu", "nice", "000002000002000002", "sys.cpu.0",
        Map("host" -> "web01")),
      (1, "sys/cpu/mboard", "Asus", "000003000003000003", "sys.cpu.0",
        Map("host" -> "web01")))
      .toDF("tree_id", "branch_path", "display_name", "tsuid", "metric",
        "tags")
    TreeStore(trees, rules, branches, leaves)
  }

  private def treeIds(t: org.apache.spark.sql.DataFrame): Seq[Int] =
    t.select("treeId").collect().map(_.getInt(0)).sorted.toSeq

  // ---- /api/tree CRUD (TestTreeRpc.handleTree* vectors) ------------

  test("tree GET all / single / not-found / 16-bit gate " +
       "(TestTreeRpc.handleTreeGet*)") {
    val s = setupStore()
    val all = TreeDefs.handleTree(s, "GET")
    assert(all.status == 200)
    assert(all.body.contains("\"name\":\"Test Tree\""))
    assert(all.body.contains("\"name\":\"2nd Tree\""))
    val single = TreeDefs.handleTree(s, "GET", Map("treeid" -> "2"))
    assert(single.body.contains("\"name\":\"2nd Tree\""))
    assert(!single.body.contains("\"name\":\"Test Tree\""))
    val nf = intercept[NoSuchElementException] {
      TreeDefs.handleTree(s, "GET", Map("treeid" -> "3")) }
    assert(nf.getMessage == "Unable to locate tree: 3")
    val bad = intercept[IllegalArgumentException] {
      TreeDefs.handleTree(s, "GET", Map("treeid" -> "655536")) }
    assert(bad.getMessage == "Invalid Tree ID")
  }

  test("tree create: QS + POST body, the no-name gate, and the " +
       "out-of-IDs path (TestTreeRpc.handleTreeQSCreate*, " +
       "handleTreePOSTCreate)") {
    val s = setupStore()
    val created = TreeDefs.handleTree(s, "POST", Map("name" -> "NewTree"))
    assert(created.status == 200)
    assert(treeIds(created.store.trees) == Seq(1, 2, 3))
    assert(created.body.contains("\"name\":\"NewTree\""))
    val posted = TreeDefs.handleTree(s, "POST",
      body = Some("""{"name":"New Tree"}"""))
    assert(treeIds(posted.store.trees) == Seq(1, 2, 3))
    val noName = intercept[IllegalArgumentException] {
      TreeDefs.handleTree(s, "POST", Map("description" -> "HelloWorld")) }
    assert(noName.getMessage == "Tree was missing the name")
    // out-of-IDs: the reference test trips the SAME missing-name gate
    // (its query has no name); with a name, the exhausted-IDs
    // IllegalStateException lands in handleTree's blanket 304 catch
    import spark.implicits._
    val full = s.copy(trees = s.trees.unionByName(
      Seq(TreeDef(65535, "max")).toDS().toDF()))
    intercept[IllegalArgumentException] {
      TreeDefs.handleTree(full, "POST") }
    assert(TreeDefs.handleTree(full, "POST",
      Map("name" -> "overflow")).status == 304)
  }

  test("tree modify: POST merges flagged fields, PUT overwrites, " +
       "no-changes is the 304, absent id the 404 " +
       "(TestTreeRpc.handleTreeQSModify*, QSPut*, POSTModify, POSTPut)") {
    val s = setupStore()
    val mod = TreeDefs.handleTree(s, "POST",
      Map("treeid" -> "1", "description" -> "HelloWorld"))
    assert(mod.status == 200)
    assert(mod.body.contains("\"description\":\"HelloWorld\""))
    assert(mod.body.contains("\"name\":\"Test Tree\""))
    val modJson = TreeDefs.handleTree(s, "POST",
      body = Some("""{"treeId":1,"description":"Hello World"}"""))
    assert(modJson.body.contains("\"description\":\"Hello World\""))
    assert(modJson.body.contains("\"name\":\"Test Tree\""))
    intercept[NoSuchElementException] { TreeDefs.handleTree(s, "POST",
      Map("treeid" -> "3", "description" -> "HelloWorld")) }
    assert(TreeDefs.handleTree(s, "POST",
      Map("treeid" -> "1")).status == 304)
    assert(TreeDefs.handleTree(s, "PUT",
      Map("treeid" -> "1")).status == 304)
    intercept[NoSuchElementException] { TreeDefs.handleTree(s, "PUT",
      Map("treeid" -> "3", "description" -> "HelloWorld")) }
    // PUT = overwrite: un-flagged fields reset to the POJO defaults
    val put = TreeDefs.handleTree(s, "PUT",
      Map("treeid" -> "1", "description" -> "HelloWorld"))
    assert(put.body.contains("\"description\":\"HelloWorld\""))
    assert(put.body.contains("\"name\":\"\""))
    val putJson = TreeDefs.handleTree(s, "PUT",
      body = Some("""{"treeId":1,"description":"Hello World"}"""))
    assert(putJson.body.contains("\"description\":\"Hello World\""))
    assert(putJson.body.contains("\"name\":\"\""))
  }

  test("tree delete: default keeps the definition+rules, " +
       "definition=true purges them, both drop branches+leaves " +
       "(TestTreeRpc.handleTreeQSDelete*, POSTDelete*)") {
    val s = setupStore()
    val del = TreeDefs.handleTree(s, "DELETE", Map("treeid" -> "1"))
    assert(del.status == 204)
    assert(treeIds(del.store.trees) == Seq(1, 2))
    assert(del.store.rules.filter(col("treeId") === 1).count() == 2)
    assert(del.store.branches.filter(col("tree_id") === 1).count() == 0)
    assert(del.store.leaves.filter(col("tree_id") === 1).count() == 0)
    val delDef = TreeDefs.handleTree(s, "DELETE",
      Map("treeid" -> "1", "definition" -> "true"))
    assert(delDef.status == 204)
    assert(treeIds(delDef.store.trees) == Seq(2))
    assert(delDef.store.rules.filter(col("treeId") === 1).count() == 0)
    assert(delDef.store.branches.filter(col("tree_id") === 1).count() == 0)
    // POST-body forms, {"definition":true} double-parsed as a string
    val delBody = TreeDefs.handleTree(s, "DELETE",
      body = Some("""{"treeId":1}"""))
    assert(delBody.store.rules.filter(col("treeId") === 1).count() == 2)
    val delBodyDef = TreeDefs.handleTree(s, "DELETE",
      body = Some("""{"treeId":1,"definition":true}"""))
    assert(treeIds(delBodyDef.store.trees) == Seq(2))
    intercept[NoSuchElementException] {
      TreeDefs.handleTree(s, "DELETE", Map("treeid" -> "3")) }
    intercept[IllegalArgumentException] {
      TreeDefs.handleTree(s, "TRACE", Map("treeid" -> "1")) }
  }

  // ---- /api/tree/branch (TestTreeRpc.handleBranch*) ----------------

  test("branch id codec: compile/parse round-trip and the reference's " +
       "hex pins (Branch.compileBranchId path hashes)") {
    // the exact ids TestTreeRpc asserts against storage
    assert(TreeDefs.branchIdHex(1, Seq("sys", "cpu")) ==
      "00010001BECD000181A8")
    assert(TreeDefs.branchIdHex(1, Seq("sys", "cpu", "mboard")) ==
      "00010001BECD000181A8BF992A99")
    assert(TreeDefs.idToString(TreeDefs.stringToId("00010001BECD")) ==
      "00010001BECD")
    assert(intercept[IllegalArgumentException] {
      TreeDefs.stringToId("") }.getMessage == "Branch ID was empty")
    assert(intercept[IllegalArgumentException] {
      TreeDefs.stringToId("001") }.getMessage == "Branch ID was too short")
    assert(intercept[IllegalArgumentException] {
      TreeDefs.treeIdToBytes(0) }.getMessage ==
      "Missing or invalid tree ID")
    assert(TreeDefs.bytesToTreeId(Array(0x00.toByte, 0x02.toByte)) == 2)
    // JavaHashCode expression == the JVM's own hash
    import spark.implicits._
    val got = Seq("sys", "cpu", "mboard", "", "日本")
      .toDF("s").select(graft.functions.JavaHashCode(col("s"))).collect()
      .map(_.getInt(0)).toSeq
    assert(got == Seq("sys", "cpu", "mboard", "", "日本").map(_.hashCode))
  }

  test("branch browse: root doc, child doc with leaves+branches, " +
       "404s (TestTreeRpc.handleBranchRoot/Child/NotFound/NoTree)") {
    val s = setupStore()
    val root = TreeDefs.handleBranch(s, "GET", Map("treeid" -> "1"))
    assert(root.status == 200)
    assert(root.body.contains("\"displayName\":\"ROOT\""))
    assert(root.body.contains("\"branches\":null"))
    val child = TreeDefs.handleBranch(s, "GET",
      Map("branch" -> "00010001BECD000181A8"))
    assert(child.body.contains("\"metric\":\"sys.cpu.0\""))
    assert(child.body.contains("\"branches\":["))
    assert(child.body.contains("\"displayName\":\"mboard\""))
    assert(child.body.contains("\"displayName\":\"user\""))
    assert(child.body.contains("\"tsuid\":\"000001000001000001\""))
    val nf = intercept[NoSuchElementException] {
      TreeDefs.handleBranch(s, "GET",
        Map("branch" -> "00010001BECD000181A8BBBBB")) }
    assert(nf.getMessage.startsWith("Unable to locate branch '"))
    assert(intercept[IllegalArgumentException] {
      TreeDefs.handleBranch(s, "GET") }.getMessage ==
      "Missing or invalid branch and tree IDs")
    intercept[IllegalArgumentException] {
      TreeDefs.handleBranch(s, "TRACE", Map("treeid" -> "1")) }
  }

  test("branch browse, relational form: children + leaves of the " +
       "addressed node, root addressing by bare tree id") {
    val s = setupStore()
    val rows = TreeDefs.browseRows(s.branches, s.leaves,
      "00010001BECD000181A8").collect()
    assert(rows.map(r => (r.getString(1), r.getString(2))).toSeq == Seq(
      ("branch", "mboard"), ("leaf", "nice"), ("leaf", "user")))
    assert(rows.filter(_.getString(1) == "leaf")
      .map(_.getString(4)).sorted.toSeq ==
      Seq("000001000001000001", "000002000002000002"))
    // deeper: mboard's leaves only, no children
    val deep = TreeDefs.browseRows(s.branches, s.leaves,
      "00010001BECD000181A8BF992A99").collect()
    assert(deep.map(r => (r.getString(1), r.getString(2))).toSeq ==
      Seq(("leaf", "Asus")))
    intercept[NoSuchElementException] {
      TreeDefs.browseRows(s.branches, s.leaves, "0001FFFFFFFF").collect() }
  }

  test("buildBranchStore: branches stop above the leaf level, leaves " +
       "carry Leaf fields, min-tsuid collision winner; browse composes") {
    import spark.implicits._
    val series = Seq(
      ("sys.cpu.user", Map("host" -> "web01")),
      ("sys.cpu.user", Map("host" -> "web02")),
      ("sys.mem.free", Map("host" -> "web01")))
      .toDF("metric", "tags")
      .withColumn("ts", lit(0L)).withColumn("value", lit(1.0))
    val rules = Seq(
      Trees.Rule(1, 0, 0, "METRIC", separator = "."),
      Trees.Rule(1, 1, 0, "METRIC", separator = ".", component = 1),
      Trees.Rule(1, 2, 0, "TAGK", field = "host"))
      .foldLeft(Trees.emptyRules(spark))(Trees.upsertRule)
    val (branches, leaves) = Trees.buildBranchStore(series, rules, 1)
    // depth 3 tree → branch rows at depth 1..2 only
    assert(branches.agg(max("depth")).head.getInt(0) == 2)
    assert(branches.filter(col("path") === "sys/cpu").count() == 1)
    val leafRows = leaves.collect()
    assert(leafRows.length == 3)
    assert(leafRows.forall(_.getString(4) startsWith "sys."))
    val browsed = TreeDefs.browseRows(branches, leaves,
      TreeDefs.branchIdHex(1, Seq("sys", "cpu"))).collect()
    assert(browsed.map(r => (r.getString(1), r.getString(2))).toSeq ==
      Seq(("leaf", "web01"), ("leaf", "web02")))
    // root browse: the single depth-1 child
    val rootKids = TreeDefs.browseRows(branches, leaves,
      TreeDefs.idToString(TreeDefs.treeIdToBytes(1))).collect()
    assert(rootKids.map(_.getString(2)).toSeq == Seq("sys"))
  }

  test("branch store round-trips through parquet: the V1 doc and the " +
       "root browse serve off the stored partitioned layout") {
    val s = setupStore()
    val dir = java.nio.file.Files.createTempDirectory("treestore").toString
    TreeDefs.writeBranchStore(s.branches, s.leaves, dir)
    val (b, l) = TreeDefs.readBranchStore(spark, dir)
    val doc = TreeDefs.branchDoc(s.trees, b, l, "00010001BECD000181A8")
    assert(doc.contains("\"metric\":\"sys.cpu.0\""))
    assert(doc.contains("\"displayName\":\"mboard\""))
    assert(doc.contains("\"tsuid\":\"000001000001000001\""))
    assert(doc.contains("\"host\":\"web01\""))
    val root = TreeDefs.branchDoc(s.trees, b, l,
      TreeDefs.idToString(TreeDefs.treeIdToBytes(1)))
    assert(root.contains("\"displayName\":\"ROOT\""))
    assert(root.contains("\"branches\":null"))
  }

  // ---- /api/tree/rule (TestTreeRpc.handleRule*) --------------------

  test("rule GET: fetch, rule-404 with the [t:l:o:TYPE] identity, " +
       "tree-404, required params (TestTreeRpc.handleRuleGetQS*)") {
    val s = setupStore()
    val got = TreeDefs.handleRule(s, "GET",
      Map("treeid" -> "1", "level" -> "1", "order" -> "0"))
    assert(got.body.contains("\"type\":\"METRIC\""))
    assert(got.body.contains("\"level\":1"))
    val nf = intercept[NoSuchElementException] {
      TreeDefs.handleRule(s, "GET",
        Map("treeid" -> "1", "level" -> "2", "order" -> "2")) }
    assert(nf.getMessage == "Unable to locate rule: [1:2:2:null]")
    intercept[NoSuchElementException] { TreeDefs.handleRule(s, "GET",
      Map("treeid" -> "4", "level" -> "1", "order" -> "0")) }
    assert(intercept[IllegalArgumentException] {
      TreeDefs.handleRule(s, "GET", Map("level" -> "1", "order" -> "0"))
    }.getMessage == "Missing parameter <code>treeid</code>")
    assert(intercept[IllegalArgumentException] {
      TreeDefs.handleRule(s, "GET", Map("treeid" -> "1", "order" -> "0"))
    }.getMessage == "Missing parameter <code>level</code>")
    assert(intercept[IllegalArgumentException] {
      TreeDefs.handleRule(s, "GET", Map("treeid" -> "1", "level" -> "1"))
    }.getMessage == "Missing parameter <code>order</code>")
  }

  test("rule POST/PUT: new-rule store, validation gates, 304 on no " +
       "changes, merge-vs-overwrite on existing rules " +
       "(TestTreeRpc.handleRuleQS*, POST*, PUT)") {
    val s = setupStore()
    val fresh = TreeDefs.handleRule(s, "POST", Map("treeid" -> "1",
      "level" -> "2", "order" -> "1", "description" -> "Testing",
      "type" -> "metric"))
    assert(fresh.status == 200)
    assert(fresh.body.contains("\"description\":\"Testing\""))
    assert(fresh.body.contains("\"level\":2"))
    // validation: TAGK without field / no type at all
    assert(intercept[IllegalArgumentException] {
      TreeDefs.handleRule(s, "POST", Map("treeid" -> "1", "level" -> "2",
        "order" -> "1", "description" -> "Testing", "type" -> "tagk"))
    }.getMessage == "Missing field name required for TAGK rule")
    assert(intercept[IllegalArgumentException] {
      TreeDefs.handleRule(s, "POST", Map("treeid" -> "1", "level" -> "2",
        "order" -> "1", "description" -> "Testing"))
    }.getMessage == "Missing rule type")
    // POST with no copyable changes on a stored rule → 304
    assert(TreeDefs.handleRule(s, "POST", Map("treeid" -> "1",
      "level" -> "1", "order" -> "0")).status == 304)
    // POST merge keeps unflagged stored fields (notes)
    val merged = TreeDefs.handleRule(s, "POST", Map("treeid" -> "1",
      "level" -> "1", "order" -> "0", "description" -> "Testing"))
    assert(merged.body.contains("\"description\":\"Testing\""))
    assert(merged.body.contains("\"notes\":\"Metric rule\""))
    // JSON body forms
    val postNew = TreeDefs.handleRule(s, "POST", body = Some(
      """{"treeId":1,"level":2,"order":2,"description":"Testing","type":"metric"}"""))
    assert(postNew.body.contains("\"level\":2"))
    val postMod = TreeDefs.handleRule(s, "POST", body = Some(
      """{"treeId":1,"level":1,"order":0,"description":"Testing"}"""))
    assert(postMod.body.contains("\"notes\":\"Metric rule\""))
    // PUT overwrites: notes resets; PUT without type fails validation
    val put = TreeDefs.handleRule(s, "PUT", Map("treeid" -> "1",
      "level" -> "1", "order" -> "0", "description" -> "Testing",
      "type" -> "metric"))
    assert(put.body.contains("\"description\":\"Testing\""))
    assert(!put.body.contains("\"notes\":\"Metric rule\""))
    assert(intercept[IllegalArgumentException] {
      TreeDefs.handleRule(s, "PUT", Map("treeid" -> "1", "level" -> "1",
        "order" -> "0", "description" -> "Testing"))
    }.getMessage == "Missing rule type")
    val putJson = TreeDefs.handleRule(s, "PUT", body = Some(
      """{"treeId":1,"level":1,"order":0,"description":"Testing","type":"metric"}"""))
    assert(!putJson.body.contains("\"notes\":\"Metric rule\""))
  }

  test("rule DELETE: drops the identity, 404 when absent " +
       "(TestTreeRpc.handleRuleQSDelete*, handleRuleDELETE)") {
    val s = setupStore()
    val del = TreeDefs.handleRule(s, "DELETE",
      Map("treeid" -> "1", "level" -> "1", "order" -> "0"))
    assert(del.status == 204)
    assert(del.store.rules.count() == 3)
    intercept[NoSuchElementException] { TreeDefs.handleRule(s, "DELETE",
      Map("treeid" -> "1", "level" -> "2", "order" -> "0")) }
    val delJson = TreeDefs.handleRule(s, "DELETE",
      body = Some("""{"treeId":1,"level":1,"order":0}"""))
    assert(delJson.store.rules.count() == 3)
  }

  // ---- /api/tree/rules bulk (TestTreeRpc.handleRules*) -------------

  val bulkBody: String =
    """[{"treeId":1,"level":0,"order":0,"type":"METRIC"},
      |{"treeId":1,"level":0,"order":1,"type":"tagk","field":"fqdn"},
      |{"treeId":1,"level":1,"order":0,"type":"tagk","field":"host"}]"""
      .stripMargin

  test("rules bulk POST merges, PUT replaces, DELETE purges; " +
       "empty/mismatched bodies rejected (TestTreeRpc.handleRules*)") {
    val s = setupStore()
    assert(intercept[IllegalArgumentException] {
      TreeDefs.handleRules(s, "GET", Map("treeid" -> "1"))
    }.getMessage == "Unsupported HTTP request method")
    val post = TreeDefs.handleRules(s, "POST", body = Some(bulkBody))
    assert(post.status == 204)
    assert(post.store.rules.filter(col("treeId") === 1).count() == 3)
    val r00 = TreeDefs.fetchRule(post.store.rules, 1, 0, 0).get
    // POST merge: the stored TAGK rule's description survives the
    // type change (reference asserts both in the stored column)
    assert(r00.ruleType == "METRIC" && r00.description == "Host Name")
    assert(intercept[IllegalArgumentException] {
      TreeDefs.handleRules(s, "POST", body = Some("[]"))
    }.getMessage == "Missing tree rules")
    val put = TreeDefs.handleRules(s, "PUT", body = Some(bulkBody))
    assert(put.store.rules.filter(col("treeId") === 1).count() == 3)
    val p00 = TreeDefs.fetchRule(put.store.rules, 1, 0, 0).get
    assert(p00.ruleType == "METRIC" && p00.description == "")
    assert(intercept[IllegalArgumentException] {
      TreeDefs.handleRules(s, "POST", body = Some(bulkBody
        .replaceFirst("\"treeId\":1", "\"treeId\":2")))
    }.getMessage == "All rules must belong to the same tree")
    val del = TreeDefs.handleRules(s, "DELETE", Map("treeid" -> "1"))
    assert(del.status == 204)
    assert(del.store.rules.filter(col("treeId") === 1).count() == 0)
    assert(del.store.rules.filter(col("treeId") === 2).count() == 2)
    intercept[NoSuchElementException] {
      TreeDefs.handleRules(s, "DELETE", Map("treeid" -> "5")) }
  }

  // ---- /api/tree/test (TestTreeRpc.handleTest*) --------------------

  test("tree test endpoint: per-TSUID trace, missing-meta message, " +
       "gates (TestTreeRpc.handleTest*)") {
    import spark.implicits._
    val s = setupStore()
    val series = Seq(("sys.cpu.0", Map("host" -> "web01")))
      .toDF("metric", "tags")
    val good = "sys.cpu.0|host=web01" // Trees.canonicalTsuid rendering
    val rows = TreeDefs.handleTest(s, series, "GET",
      Map("treeid" -> "1", "tsuids" -> s"$good,ghost")).collect()
    // tree 1 has two rules (0:0 TAGK host, 1:0 METRIC) → two trace
    // rows for the resolvable tsuid, both matched
    val g = rows.filter(_.getString(0) == good)
    assert(g.length == 2 && g.forall(_.getBoolean(6)))
    // the unresolvable tsuid emits the reference's meta-miss message
    val ghost = rows.filter(_.getString(0) == "ghost")
    assert(ghost.map(_.getString(7)).toSeq ==
      Seq("Unable to locate TSUID meta data"))
    // body form (handleTestPOST/PUT)
    assert(TreeDefs.handleTest(s, series, "PUT", body = Some(
      s"""{"treeId":1,"tsuids":["$good"]}""")).count() == 2)
    // gates
    intercept[NoSuchElementException] { TreeDefs.handleTest(s, series,
      "GET", Map("treeid" -> "3", "tsuids" -> good)) }
    assert(intercept[IllegalArgumentException] {
      TreeDefs.handleTest(s, series, "GET", Map("treeid" -> "1"))
    }.getMessage == "Missing or empty TSUID list")
    assert(intercept[IllegalArgumentException] {
      TreeDefs.handleTest(s, series, "POST",
        body = Some(s"""{"tsuids":["$good"]}"""))
    }.getMessage == "Missing or invalid Tree ID")
    intercept[IllegalArgumentException] {
      TreeDefs.handleTest(s, series, "TRACE", Map("treeid" -> "1")) }
  }

  // ---- /api/tree/collisions|notmatched (TestTreeRpc vectors) -------

  test("collisions/notmatched documents: full map, tsuid filters, " +
       "gates (TestTreeRpc.handleCollissions*/handleNotMatched*)") {
    import spark.implicits._
    val s = setupStore()
    val collisions = Seq(
      ("010101", "AAAAAA", "p1"), ("020202", "BBBBBB", "p2"))
      .toDF("tsuid", "existing_tsuid", "path")
    val notMatched = Seq(
      ("010101", "Failed rule 0:0"), ("020202", "Failed rule 1:1"))
      .toDF("tsuid", "message")
    val all = TreeDefs.handleCollisionsNotMatched(s, collisions,
      forCollisions = true, Map("treeid" -> "1"))
    assert(all.body.contains("\"010101\":\"AAAAAA\""))
    assert(all.body.contains("\"020202\":\"BBBBBB\""))
    val one = TreeDefs.handleCollisionsNotMatched(s, collisions,
      forCollisions = true, Map("treeid" -> "1", "tsuids" -> "010101"))
    assert(one.body == """{"010101":"AAAAAA"}""")
    val miss = TreeDefs.handleCollisionsNotMatched(s, collisions,
      forCollisions = true, Map("treeid" -> "1", "tsuids" -> "030101"))
    assert(miss.body == "{}")
    val postOne = TreeDefs.handleCollisionsNotMatched(s, collisions,
      forCollisions = true,
      body = Some("""{"treeId":1,"tsuids":["020202"]}"""))
    assert(postOne.body == """{"020202":"BBBBBB"}""")
    val nm = TreeDefs.handleCollisionsNotMatched(s, notMatched,
      forCollisions = false, Map("treeid" -> "1", "tsuids" -> "010101"))
    assert(nm.body == """{"010101":"Failed rule 0:0"}""")
    val nmAll = TreeDefs.handleCollisionsNotMatched(s, notMatched,
      forCollisions = false, body = Some("""{"treeId":1}"""))
    assert(nmAll.body.contains("\"020202\":\"Failed rule 1:1\""))
    intercept[NoSuchElementException] {
      TreeDefs.handleCollisionsNotMatched(s, collisions,
        forCollisions = true, Map("treeid" -> "5")) }
    assert(intercept[IllegalArgumentException] {
      TreeDefs.handleCollisionsNotMatched(s, collisions,
        forCollisions = true)
    }.getMessage == "Missing parameter <code>treeid</code>")
    assert(intercept[IllegalArgumentException] {
      TreeDefs.handleCollisionsNotMatched(s, collisions,
        forCollisions = true, body = Some("""{"tsuids":["010101"]}"""))
    }.getMessage == "Missing or invalid Tree ID")
  }

  test("collisions/notmatched limit: caps the document at the first N " +
       "tsuids in sort order (bounded driver memory at 10^6+ collisions)") {
    import spark.implicits._
    val s = setupStore()
    val collisions = (1 to 50).map(i => (f"$i%06d", "AAAAAA", s"p$i"))
      .toDF("tsuid", "existing_tsuid", "path")
    val capped = TreeDefs.handleCollisionsNotMatched(s, collisions,
      forCollisions = true, Map("treeid" -> "1", "limit" -> "3"))
    assert(capped.body == """{"000001":"AAAAAA","000002":"AAAAAA","000003":"AAAAAA"}""")
    // param form, and limit over a tsuid filter composes
    val both = TreeDefs.handleCollisionsNotMatched(s, collisions,
      forCollisions = true,
      Map("treeid" -> "1", "tsuids" -> "000002,000005"), limit = Some(1))
    assert(both.body == """{"000002":"AAAAAA"}""")
    // default stays reference-compatible: unlimited
    val all = TreeDefs.handleCollisionsNotMatched(s, collisions,
      forCollisions = true, Map("treeid" -> "1"))
    assert(all.body.contains("\"000050\":"))
    intercept[IllegalArgumentException] {
      TreeDefs.handleCollisionsNotMatched(s, collisions,
        forCollisions = true, Map("treeid" -> "1", "limit" -> "-1")) }
  }

  test("collisions/notmatched start_tsuid cursor: (limit, last-key) " +
       "pages the full document in deterministic disjoint pages") {
    import spark.implicits._
    val s = setupStore()
    val collisions = (1 to 10).map(i => (f"$i%06d", "AAAAAA", s"p$i"))
      .toDF("tsuid", "existing_tsuid", "path")
    def keysOf(body: String): Seq[String] =
      """"(\d{6})":""".r.findAllMatchIn(body).map(_.group(1)).toSeq
    // page through with limit 4: 4 + 4 + 2, strictly-after semantics
    var cursor = Option.empty[String]
    val pages = Iterator.continually {
      val page = TreeDefs.handleCollisionsNotMatched(s, collisions,
        forCollisions = true,
        Map("treeid" -> "1", "limit" -> "4") ++
          cursor.map("start_tsuid" -> _))
      val ks = keysOf(page.body)
      cursor = ks.lastOption
      ks
    }.takeWhile(_.nonEmpty).take(5).toSeq
    assert(pages.map(_.size) == Seq(4, 4, 2))
    // concatenated pages == the uncapped document, in order, no overlap
    val all = keysOf(TreeDefs.handleCollisionsNotMatched(s, collisions,
      forCollisions = true, Map("treeid" -> "1")).body)
    assert(pages.flatten == all)
    // the param form composes with a limit param
    val p2 = TreeDefs.handleCollisionsNotMatched(s, collisions,
      forCollisions = true, Map("treeid" -> "1"),
      limit = Some(3), startTsuid = Some("000008"))
    assert(keysOf(p2.body) == Seq("000009", "000010"))
  }

  test("path elements containing '/' stay addressable: the branch id " +
       "hashes WHOLE element names (Branch.compileBranchId) and the " +
       "stored path escapes the separator, so ['a/b'] never conflates " +
       "with ['a','b']") {
    import spark.implicits._
    val series = Seq(
      ("req/s", Map("route" -> "api/v1")),   // both elements contain "/"
      ("req/s", Map("route" -> "web")),
      ("mem", Map("route" -> "api", "extra" -> "v1")))
      .toDF("metric", "tags")
      .withColumn("ts", lit(0L)).withColumn("value", lit(1.0))
    val rules = Seq(
      Trees.Rule(1, 0, 0, "METRIC"),
      Trees.Rule(1, 1, 0, "TAGK", field = "route"))
      .foldLeft(Trees.emptyRules(spark))(Trees.upsertRule)
    val (branches, leaves) = Trees.buildBranchStore(series, rules, 1)
    // the depth-1 node "req/s" is ONE branch (not two), addressable by
    // the hex of its whole name
    val hex = TreeDefs.branchIdHex(1, Seq("req/s"))
    val kids = TreeDefs.browseRows(branches, leaves, hex).collect()
    assert(kids.map(r => (r.getString(1), r.getString(2))).toSeq ==
      Seq(("leaf", "api/v1"), ("leaf", "web")))
    // and the V1 doc renders the RAW (unescaped) element names
    val trees = TreeDefs.storeTree(TreeDefs.emptyTrees(spark),
      TreeDefs.TreeDef(1, "t"), changed = Set("name"), overwrite = false)
    val doc = TreeDefs.branchDoc(trees, branches, leaves, hex)
    assert(doc.contains("\"1\":\"req/s\""), doc)
    assert(doc.contains("\"displayName\":\"req/s\""), doc)
    assert(doc.contains("\"displayName\":\"api/v1\""), doc)
    // distinct tuples ["api/v1"] vs ["api","v1"]-shaped names never
    // share an address: a 2-element chain over metric "req/s" is a 404
    intercept[NoSuchElementException] {
      TreeDefs.browseRows(branches, leaves,
        TreeDefs.branchIdHex(1, Seq("req", "s"))).collect() }
    // root browse of an UNDEFINED tree 404s like branchDoc does
    intercept[NoSuchElementException] {
      TreeDefs.browseRows(branches.filter(col("tree_id") === 99), leaves,
        TreeDefs.idToString(TreeDefs.treeIdToBytes(7))).collect() }
  }
}
