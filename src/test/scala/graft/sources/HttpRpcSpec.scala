package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** HttpRpc against an in-process JSON-RPC stub: request encoding, response
  * decoding, node-cap error mapping (→ TooManyResultsException, the
  * bisection trigger), and transport retry — the testable core of the
  * reference's resilience envelope (LogsService.java:567-606,646-662).
  */
class HttpRpcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var url: String = _
  private val failuresToInject = new AtomicInteger(0)
  private val serverErrorsToInject = new AtomicInteger(0)
  @volatile private var badRequestOnce = false
  @volatile private var lastBody: String = ""

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      lastBody = body
      if (failuresToInject.getAndUpdate(n => math.max(0, n - 1)) > 0) {
        ex.close() // slam the connection → IOException client-side
      } else if (serverErrorsToInject.getAndUpdate(n => math.max(0, n - 1)) > 0) {
        val bytes = "boom".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(503, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      } else if (badRequestOnce) {
        badRequestOnce = false
        val bytes = "<html>bad request</html>".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(400, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      } else {
        val resp =
          if (body.contains("eth_blockNumber")) """{"jsonrpc":"2.0","id":1,"result":"0x64"}"""
          else if (body.contains("\"fromBlock\":\"0x10\"")) // range [16..n] → node cap
            """{"jsonrpc":"2.0","id":1,"error":{"code":-32005,"message":"query returned more than 10000 results"}}"""
          else if (body.contains("\"fromBlock\":\"0x20\"")) // range [32..n] → size cap, reference wording
            """{"jsonrpc":"2.0","id":1,"error":{"code":-32008,"message":"response is too big"}}"""
          else if (body.contains("\"0x7b\"")) // block 123 → unknown block
            """{"jsonrpc":"2.0","id":1,"result":null}"""
          else if (body.contains("\"0x7c\"")) // block 124 → minimal header, optionals absent
            """{"jsonrpc":"2.0","id":1,"result":{"number":"0x7c","hash":"0xh"}}"""
          else if (body.contains("eth_getLogs"))
            """{"jsonrpc":"2.0","id":1,"result":[
                 {"address":"0xABCD","data":"0x00","topics":["0x11","0x22"],
                  "blockNumber":"0x2a","transactionHash":"0xth","transactionIndex":"0x1",
                  "blockHash":"0xbh","logIndex":"0x0","removed":false}]}"""
          else if (body.contains("eth_getBlockByNumber"))
            """{"jsonrpc":"2.0","id":1,"result":{
                 "number":"0x2a","hash":"0xh","parentHash":"0xp","nonce":"0xn",
                 "sha3Uncles":"0xu","logsBloom":"0xb","transactionsRoot":"0xtr",
                 "stateRoot":"0xsr","receiptsRoot":"0xrr","miner":"0xMINER",
                 "mixHash":"0xm","difficulty":"0x10","totalDifficulty":"0xc70d815d562d3cfa955",
                 "extraData":"0xe","size":"0x1f4","gasLimit":"0x1c9c380","gasUsed":"0x5208",
                 "timestamp":"0x65600000","transactions":["0xt1","0xt2"],"uncles":[]}}"""
          else """{"jsonrpc":"2.0","id":1,"error":{"message":"unknown method"}}"""
        val bytes = resp.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    url = s"http://127.0.0.1:${server.getAddress.getPort}/"
  }

  override def afterAll(): Unit = server.stop(0)

  private def rpc = new HttpRpc(url, fetchDelayMs = 0, maxRetries = 3, initialBackoffMs = 10)

  test("blockNumber decodes hex quantity") {
    assert(rpc.blockNumber() === 100L)
  }

  test("getLogs encodes filter params per reference semantics and decodes rows") {
    val logs = rpc.getLogs(16 + 26, 100, Seq("0xAAAA", "0xBBBB"), Seq("0x11"))
    // address normalized to lowercase at ingest (reference quirk §8.5)
    assert(logs.head.address === "0xabcd")
    assert(logs.head.blockNumber === 42L)
    assert(logs.head.topics === Seq("0x11", "0x22"))
    assert(logs.head.transactionIndex === 1)
    // request carried addresses verbatim and all topics OR'd in slot 0
    // (reference: LogsService.java:384-386,548-556)
    assert(lastBody.contains(""""address":["0xAAAA","0xBBBB"]"""))
    assert(lastBody.contains(""""topics":[["0x11"]]"""))
  }

  test("node result-cap error maps to TooManyResultsException (bisection trigger)") {
    intercept[TooManyResultsException](rpc.getLogs(16, 700, Seq.empty, Seq.empty))
  }

  test("transport failures retry with backoff, then succeed") {
    failuresToInject.set(2) // two slammed connections, third attempt succeeds
    assert(rpc.blockNumber() === 100L)
  }

  test("getBlock decodes header incl. >int64 totalDifficulty kept as hex string") {
    val b = rpc.getBlock(42).get
    assert(b.number === 42L)
    assert(b.miner === "0xminer") // lowercased
    assert(b.totalDifficulty === "0xc70d815d562d3cfa955") // raw hex preserved
    assert(b.size === 500L)
    assert(b.gasUsed === 21000L)
    assert(b.transactions === Seq("0xt1", "0xt2"))
    assert(rpc.getBlock(42).isDefined)
  }

  test("getBlock of an unknown block (null result) is None") {
    assert(rpc.getBlock(123).isEmpty)
  }

  test("getBlock tolerates absent optional fields (null strings, zero quantities, empty arrays)") {
    val b = rpc.getBlock(124).get
    assert(b.number === 124L)
    assert(b.hash === "0xh")
    assert(b.author === null && b.miner === null && b.parentHash === null)
    assert(b.size === 0L && b.gasUsed === 0L && b.timestamp === 0L)
    assert(b.transactions === Seq.empty && b.uncles === Seq.empty && b.sealFields === Seq.empty)
  }

  test("'response is too big' (reference wording) maps to TooManyResultsException") {
    intercept[TooManyResultsException](rpc.getLogs(32, 700, Seq.empty, Seq.empty))
  }

  test("5xx responses retry like transport failures, then succeed") {
    serverErrorsToInject.set(2)
    assert(rpc.blockNumber() === 100L)
  }

  test("other non-2xx responses fail fast without JSON parsing") {
    badRequestOnce = true
    val e = intercept[RuntimeException](rpc.blockNumber())
    assert(e.getMessage.contains("400"))
    assert(rpc.blockNumber() === 100L) // flag consumed exactly once → no retry happened
  }
}
