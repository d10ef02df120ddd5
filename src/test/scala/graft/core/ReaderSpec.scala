package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.ExecutionContext.Implicits.global

/** Behavioral port of the reference ReaderSpecs
  * (`/root/reference/etl4s/test/src/Etl4sSpec.scala:273-628`).
  */
class ReaderSpec extends AnyFunSuite {

  case class Config(prefix: String, multiplier: Int)

  test("requires + provide injects config") {
    val scale = Transform.requires[Config, Int, Int] { cfg => x => x * cfg.multiplier }
    val node = scale.provide(Config("", 3))
    assert(node.unsafeRun(5) == 15)
  }

  test("instance requires replaces the wrapped function") {
    val n = Transform[Int, Int](identity).requires[Config] { cfg => x => x * cfg.multiplier }
    assert(n.provide(Config("", 4)).unsafeRun(2) == 8)
  }

  test("reader-level ~> composes without a config") {
    val e = Extract.requires[Config, Unit, Int](cfg => _ => cfg.multiplier)
    val t = Transform.requires[Config, Int, String](cfg => n => s"${cfg.prefix}$n")
    val pipeline = e ~> t
    assert(pipeline.provide(Config("v=", 9)).unsafeRun(()) == "v=9")
  }

  test("reader ~> plain node") {
    val e = Extract.requires[Config, Unit, Int](cfg => _ => cfg.multiplier)
    val t = Node[Int, Int](_ + 1)
    assert((e ~> t).provide(Config("", 1)).unsafeRun(()) == 2)
  }

  test("plain node ~> reader") {
    val n = Node[Unit, Int](_ => 10)
    val r = Transform.requires[Config, Int, Int](cfg => x => x * cfg.multiplier)
    assert((n ~> r).provide(Config("", 5)).unsafeRun(()) == 50)
  }

  test("reader & fan-out shares the config") {
    val a = Extract.requires[Config, Unit, Int](cfg => _ => cfg.multiplier)
    val b = Extract.requires[Config, Unit, String](cfg => _ => cfg.prefix)
    val both = a & b
    assert(both.provide(Config("p", 2)).unsafeRun(()) == ((2, "p")))
  }

  test("reader >> sequences on the same input") {
    val log = scala.collection.mutable.ListBuffer.empty[String]
    val first = Load.requires[Config, Int, Unit](cfg => n => log += s"${cfg.prefix}a$n")
    val second = Load.requires[Config, Int, String](cfg => n => { log += s"${cfg.prefix}b$n"; "ok" })
    assert((first >> second).provide(Config("x", 0)).unsafeRun(3) == "ok")
    assert(log.toList == List("xa3", "xb3"))
  }

  test("subtype config compatibility unifies environments") {
    trait HasDb { def db: String }
    trait HasApi { def api: String }
    case class Both(db: String, api: String) extends HasDb with HasApi

    val readDb = Extract.requires[Both, Unit, String](cfg => _ => cfg.db)
    val readAll = Transform.requires[Both, String, String](cfg => s => s"$s+${cfg.api}")
    val p = readDb ~> readAll
    assert(p.provide(Both("d", "a")).unsafeRun(()) == "d+a")
  }

  test("Reader.pure and ask") {
    assert(Reader.pure[Int, String]("x").run(0) == "x")
    assert(Reader.ask[Int].run(42) == 42)
  }

  test("reader map and flatMap") {
    val r = Reader[Int, Int](_ * 2).map(_ + 1)
    assert(r.run(10) == 21)
    val fm = Reader[Int, Int](_ * 2).flatMap(x => Reader[Int, Int](env => env + x))
    assert(fm.run(10) == 30)
  }

  test("Context factories scope config naturally") {
    case class AppCfg(name: String, factor: Int)
    object App extends Context[AppCfg] {
      val get = Context.Extract[Unit, Int](cfg => _ => cfg.factor)
      val scale = Context.Transform[Int, Int](cfg => x => x * cfg.factor)
      val label = Context.Node[Int, String](cfg => x => s"${cfg.name}:$x")
    }
    val p = App.get ~> App.scale ~> App.label
    assert(p.provide(AppCfg("job", 3)).unsafeRun(()) == "job:9")
  }

  test("Context.tap peeks with config") {
    case class Cfg(tag: String)
    var seen = ""
    object C extends Context[Cfg] {
      val peek = Context.tap[Int](cfg => n => seen = s"${cfg.tag}:$n")
    }
    val p = Node[Unit, Int](_ => 5) ~> C.peek
    assert(p.provide(Cfg("t")).unsafeRun(()) == 5)
    assert(seen == "t:5")
  }

  test("reader tap is context-aware") {
    case class Cfg(tag: String)
    var seen = ""
    val r = Transform.requires[Cfg, Int, Int](_ => x => x + 1)
      .tap(cfg => b => seen = s"${cfg.tag}=$b")
    assert(r.provide(Cfg("out")).unsafeRun(1) == 2)
    assert(seen == "out=2")
  }

  test("cross-env composition unifies via ReaderCompat (subtype narrows)") {
    trait Base { def tag: String }
    case class Full(tag: String, factor: Int) extends Base
    // left requires only Base, right requires Full -> unified env is Full
    val l = Transform.requires[Base, Unit, String](cfg => _ => cfg.tag)
    val r = Transform.requires[Full, String, String](cfg => s => s * cfg.factor)
    val p = l.~>(r)
    assert(p.provide(Full("ab", 2)).unsafeRun(()) == "abab")
    // and the mirror: left Full, right Base
    val p2 = r.~>(Transform.requires[Base, String, Int](cfg => s => s.length + cfg.tag.length))
    assert(p2.provide(Full("xy", 3)).unsafeRun("z") == 5)
  }

  test("reader &> runs concurrently with shared config") {
    case class Cfg(ms: Long)
    val a = Extract.requires[Cfg, Unit, Int](cfg => _ => { Thread.sleep(cfg.ms); 1 })
    val b = Extract.requires[Cfg, Unit, Int](cfg => _ => { Thread.sleep(cfg.ms); 2 })
    val t0 = System.currentTimeMillis()
    assert((a &> b).provide(Cfg(80)).unsafeRun(()) == ((1, 2)))
    assert(System.currentTimeMillis() - t0 < 160)
  }
}
